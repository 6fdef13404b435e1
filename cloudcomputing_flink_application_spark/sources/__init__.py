"""Sources: batch/streaming readers and derived reference-shaped views."""
