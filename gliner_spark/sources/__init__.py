"""Sources: testdata loaders + deterministic page-table synthesis."""
