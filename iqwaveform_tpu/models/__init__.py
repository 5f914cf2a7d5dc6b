"""Domain analysis models: OFDM numerology/sync and analysis pipelines
(populated incrementally)."""
