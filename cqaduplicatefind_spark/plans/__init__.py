"""End-to-end query plans / pipeline orchestration."""
