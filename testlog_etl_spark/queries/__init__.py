"""Named query cases, grouped by milestone (see suite.REGISTRY)."""
