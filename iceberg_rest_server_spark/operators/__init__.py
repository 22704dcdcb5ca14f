"""Engine extensions Spark lacks natively (SURVEY.md §4.2 "custom" rows).

Every operator here is designed for the 100 TB rule: shuffle-parallel,
no driver-side state, Arrow-batched when Python is unavoidable.
"""
