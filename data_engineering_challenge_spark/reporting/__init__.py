"""Report artifacts: JSON profiles (operators/profiling.py) and SVG
chart twins of the reference's PNG report images (charts.py)."""
