"""Query operators. Each is a pure DataFrame -> DataFrame function."""
