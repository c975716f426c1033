"""Sources: testdata parquet loaders, CDC log generator/reader, transcript derivation."""
