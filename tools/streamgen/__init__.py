"""AV1 test-stream generator.

The image ships no AV1 encoder, so conformance streams for testing the
decoder (and the oracle cross-checks) are synthesized here: OBU headers
via PutBits, tile symbol payloads by driving dav1d_tpu's own TileParser
with a GenCoder that samples syntax decisions from a policy and feeds
them through the validated MsacEncoder (tests/test_msac.py proves
encoder/decoder/oracle agreement at the coder level).
"""
