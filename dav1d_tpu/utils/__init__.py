"""Utility subpackage: output muxers, logging, timing."""
