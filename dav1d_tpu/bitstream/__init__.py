"""Bitstream layer: bit reader, OBU/header parsing, container demuxers.

Reference behavior: /root/reference/src/getbits.c, obu.c, tools/input/*.
"""
