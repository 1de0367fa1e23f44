"""End-to-end pipeline compositions."""
