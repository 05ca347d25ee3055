"""Vector/sampling/intersection ops."""
