"""Engine operators: as-of join, windowed sequence features, dedup, similarity."""
