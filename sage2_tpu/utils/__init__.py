"""Utilities: assembly stats, metrics logging, artifact manifests."""
