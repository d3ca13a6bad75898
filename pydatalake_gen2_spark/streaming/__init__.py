"""Structured Streaming over the `events` table (SURVEY.md §2B.9)."""
