"""Structured Streaming extensions (SURVEY §7.8): nothing in the
reference streams — this is the engine's pure-Spark additive surface.
"""
