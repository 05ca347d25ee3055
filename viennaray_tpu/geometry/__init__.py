"""Geometry containers and host-side builders."""
