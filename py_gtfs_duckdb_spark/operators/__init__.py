"""Reusable distributed operators (mutation, dedup, similarity, text,
windows, multimodal). All set-based; no driver-side row loops."""
