"""Sources, reflections, particles."""
