"""Placeholder — queries registered incrementally (see SURVEY.md §7 build plan)."""
