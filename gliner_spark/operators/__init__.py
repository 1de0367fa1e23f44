"""DataFrame → DataFrame pipeline stages."""
