"""ZInD dataset + ModifiedHorizonNet prediction loaders."""
