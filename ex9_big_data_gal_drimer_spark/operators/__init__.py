"""Reusable operator library (SURVEY.md §2 / §2.11).

Each module exposes composable DataFrame→DataFrame functions; the
`plans` package wires them into driver-checkable queries.
"""
