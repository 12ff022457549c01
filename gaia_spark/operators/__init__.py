"""DataFrame→DataFrame stage operators (SURVEY.md §2.2).

Every operator is a pure function of DataFrames so the batch pipeline,
tests, and a future Structured-Streaming ``foreachBatch`` wrapper
(SURVEY.md §2.4 last row) can all compose them unchanged.
"""
