"""Error containment, fuzzing, allocator hook, and logger wiring.

Reference model: dav1d poisons a failing frame and keeps decoding
(src/thread_task.c:459-469 abort_frame, src/lib.c:716-725 error props);
its fuzzer asserts no-crash on arbitrary input
(tests/libfuzzer/dav1d_fuzzer.c:105-126). The custom-allocator contract
is include/dav1d/picture.h:107-146.
"""
import numpy as np
import pytest

from dav1d_tpu.api import DecodeError, Decoder, Settings
from dav1d_tpu.bitstream.ivf import IvfReader
from tools.streamgen.gen import generate_intra_stream, generate_stream


def _frames(data):
    return [fr.data for fr in IvfReader(data)]


def _md5_of(dec, payloads):
    """Decode payloads through the API, collecting pictures; contained
    errors are swallowed (decode continues)."""
    from dav1d_tpu.utils.muxers import Md5Muxer
    pics = []
    mux = Md5Muxer()
    for fd in payloads:
        dec.send_data(fd)
        while True:
            try:
                pic = dec.get_picture()
            except DecodeError:
                continue
            if pic is None:
                break
            pics.append(pic)
            mux.write_picture(pic)
    return pics, mux._md5.hexdigest()


# ---------------------------------------------------------------- errors

def test_corrupt_frame_is_contained():
    data, _ = generate_stream(96, 64, n_frames=4, seed=11)
    payloads = _frames(data)
    # flip bytes in the middle of frame 1's payload (tile data)
    bad = bytearray(payloads[1])
    for off in range(len(bad) // 2, min(len(bad) // 2 + 8, len(bad))):
        bad[off] ^= 0xFF
    corrupted = [payloads[0], bytes(bad)] + payloads[2:]

    dec = Decoder(Settings(n_threads=1))
    n_pics = n_errs = 0
    for fd in corrupted:
        dec.send_data(fd)
        while True:
            try:
                pic = dec.get_picture()
            except DecodeError:
                n_errs += 1
                continue
            if pic is None:
                break
            n_pics += 1
    # the keyframe must have decoded; the stream keeps going after the
    # poisoned frame instead of halting
    assert n_pics >= 1
    # a fresh keyframe stream then decodes on the SAME decoder,
    # bit-identically to a clean decoder
    data2, _ = generate_intra_stream(96, 64, seed=5)
    _, md5_clean = _md5_of(Decoder(Settings(n_threads=1)), _frames(data2))
    pics, md5 = _md5_of(dec, _frames(data2))
    assert pics and md5 == md5_clean


def test_truncated_stream_is_contained():
    data, _ = generate_stream(96, 64, n_frames=3, seed=3)
    payloads = _frames(data)
    dec = Decoder(Settings(n_threads=1))
    dec.send_data(payloads[0])
    assert dec.get_picture() is not None
    with pytest.raises(DecodeError):
        dec.send_data(payloads[1][:len(payloads[1]) // 3])
        while dec.get_picture() is not None:
            pass
    # error props point at the failing input (reference lib.c:716-725)
    assert dec.get_decode_error_data_props() is not None


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_random_input_no_crash(seed):
    """Arbitrary bytes must only ever raise DecodeError through the API
    (dav1d_fuzzer.c semantics: no crash, no hang, decoder reusable)."""
    rng = np.random.default_rng(seed)
    dec = Decoder(Settings(n_threads=1))
    for _ in range(4):
        blob = rng.integers(0, 256, int(rng.integers(1, 600)),
                            dtype=np.uint8).tobytes()
        try:
            dec.send_data(blob)
            while dec.get_picture() is not None:
                pass
        except DecodeError:
            pass


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_bitflip_no_crash(seed):
    """Single-byte corruptions of a real stream: every outcome must be
    a picture or a contained DecodeError."""
    data, _ = generate_stream(96, 64, n_frames=3, seed=7)
    payloads = _frames(data)
    rng = np.random.default_rng(100 + seed)
    for _ in range(6):
        i = int(rng.integers(0, len(payloads)))
        corrupt = bytearray(payloads[i])
        corrupt[int(rng.integers(0, len(corrupt)))] ^= \
            int(rng.integers(1, 256))
        trial = payloads[:i] + [bytes(corrupt)] + payloads[i + 1:]
        dec = Decoder(Settings(n_threads=1))
        for fd in trial:
            try:
                dec.send_data(fd)
                while dec.get_picture() is not None:
                    pass
            except DecodeError:
                pass


# ------------------------------------------------------------- allocator

class RecordingAllocator:
    """picture.h:107-146 analog: hands out views into one arena and
    records every alloc/release."""

    def __init__(self):
        self.allocs = []
        self.releases = []

    def alloc_picture_data(self, pic):
        planes = [np.empty(s, pic.dtype()) for s in pic.plane_shapes()]
        pic.allocator_data = len(self.allocs)   # cookie round-trip
        self.allocs.append(planes)
        return planes

    def release_picture_data(self, pic):
        self.releases.append(pic.allocator_data)


def test_custom_allocator_zero_copy():
    data, _ = generate_intra_stream(96, 64, seed=9)
    _, md5_ref = _md5_of(Decoder(Settings(n_threads=1)), _frames(data))
    alloc = RecordingAllocator()
    dec = Decoder(Settings(n_threads=1, allocator=alloc))
    pics, md5 = _md5_of(dec, _frames(data))
    assert md5 == md5_ref                  # decode is unchanged
    assert alloc.allocs                    # allocator was used
    # zero-copy: an output plane IS one of the allocator's buffers
    handed_out = [id(p) for planes in alloc.allocs for p in planes]
    assert any(id(pl) in handed_out for pic in pics for pl in pic.planes)
    pics[0].release()
    assert alloc.releases == [pics[0].allocator_data]


def test_allocator_bad_planes_rejected():
    from dav1d_tpu.recon.picture import (Picture, reset_picture_allocator,
                                         set_picture_allocator)

    class BadAllocator:
        def alloc_picture_data(self, pic):
            return [np.zeros((2, 2), pic.dtype())
                    for _ in pic.plane_shapes()]

    tok = set_picture_allocator(BadAllocator())
    try:
        with pytest.raises(ValueError):
            Picture(96, 64, 1, 8)
    finally:
        reset_picture_allocator(tok)


# ---------------------------------------------------------------- logger

def test_logger_captures_decode_errors():
    msgs = []
    data, _ = generate_stream(96, 64, n_frames=3, seed=3)
    payloads = _frames(data)
    dec = Decoder(Settings(n_threads=1, logger=msgs.append))
    try:
        dec.send_data(payloads[1])      # inter frame w/o its references
        while dec.get_picture() is not None:
            pass
    except DecodeError:
        pass
    assert msgs and "error" in msgs[0]


def test_logger_false_is_silent(capsys):
    data, _ = generate_stream(96, 64, n_frames=3, seed=3)
    payloads = _frames(data)
    dec = Decoder(Settings(n_threads=1, logger=False))
    try:
        dec.send_data(payloads[1])
        while dec.get_picture() is not None:
            pass
    except DecodeError:
        pass
    assert capsys.readouterr().err == ""


# ------------------------------------------------------------ stat counters

def test_decode_stats_counters():
    data, _ = generate_stream(96, 64, n_frames=3, seed=3)
    payloads = _frames(data)
    dec = Decoder(Settings(n_threads=1))
    pics, _ = _md5_of(dec, payloads)
    s = dec.stats
    assert s["pictures_out"] == len(pics) == 3
    assert s["temporal_units"] == len(payloads)
    assert s["bytes_in"] == sum(len(p) for p in payloads)
    assert s["decode_errors"] == 0 and s["decode_time_s"] > 0
    # errors are counted (fresh decoder: inter frame without its refs)
    dec2 = Decoder(Settings(n_threads=1))
    try:
        dec2.send_data(payloads[1])
        while dec2.get_picture() is not None:
            pass
    except DecodeError:
        pass
    assert dec2.stats["decode_errors"] >= 1


def test_picture_pool_recycles():
    from dav1d_tpu.recon.picture import PicturePool
    data, _ = generate_stream(96, 64, n_frames=4, seed=11)
    _, md5_ref = _md5_of(Decoder(Settings(n_threads=1)), _frames(data))
    pool = PicturePool()
    dec = Decoder(Settings(n_threads=1, allocator=pool))
    pics, md5 = _md5_of(dec, _frames(data))
    assert md5 == md5_ref
    for p in pics:                       # caller returns buffers
        p.release()
    assert pool.misses > 0
    # decoding again now reuses the released buffer sets
    dec2 = Decoder(Settings(n_threads=1, allocator=pool))
    _, md5b = _md5_of(dec2, _frames(data))
    assert md5b == md5_ref and pool.hits > 0
