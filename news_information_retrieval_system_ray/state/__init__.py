"""Persistent build state: manifests, atomic writes, resume logic."""
