"""Query registry and batch pipeline drivers."""
