"""File IO: .dat readers, VTK/VTP writers, fixtures."""
