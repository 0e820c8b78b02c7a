"""Placeholder — filled in by build milestones."""
