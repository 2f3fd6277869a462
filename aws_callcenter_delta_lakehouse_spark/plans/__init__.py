"""Named query registry — the engine's public query surface."""
