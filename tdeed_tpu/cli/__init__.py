"""Command-line entry points (train / challenge-eval / frame extraction)."""
