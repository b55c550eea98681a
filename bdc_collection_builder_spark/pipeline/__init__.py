"""The scene pipeline: search → download → correction → publish → post
re-expressed as DataFrame stages over an activity ledger (SURVEY §3)."""
