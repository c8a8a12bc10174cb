"""End-to-end stage graphs and the driver-facing query registry."""
