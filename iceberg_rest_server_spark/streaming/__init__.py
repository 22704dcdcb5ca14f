"""Structured Streaming surface (SURVEY.md §2F Q29–Q30).

The reference has no streaming operators — its only stream is the
CloudEvents change publisher (service/event_publisher.rs:83-154); the
query-plane streaming capabilities live in Spark, re-expressed here.
"""
