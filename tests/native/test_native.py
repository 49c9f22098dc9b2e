"""Native C++ layer tests: FLAC decode (verified against the STREAMINFO MD5
and against a self-contained verbatim encoder) + levenshtein."""

import hashlib
import struct

import numpy as np
import pytest

from caiman_asr_tpu.native import flac_decode, levenshtein


def encode_flac_verbatim(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal single-channel 16-bit FLAC encoder using VERBATIM subframes
    (spec-conformant; used only to round-trip-test the decoder)."""
    samples = samples.astype(np.int16)
    n = len(samples)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    class BW:
        def __init__(self):
            self.bits = []

        def w(self, value, nbits):
            for i in range(nbits - 1, -1, -1):
                self.bits.append((value >> i) & 1)

        def align(self):
            while len(self.bits) % 8:
                self.bits.append(0)

        def bytes(self):
            out = bytearray()
            for i in range(0, len(self.bits), 8):
                byte = 0
                for b in self.bits[i : i + 8]:
                    byte = (byte << 1) | b
                out.append(byte)
            return bytes(out)

    # ---- STREAMINFO
    si = BW()
    si.w(4096, 16)  # min block
    si.w(4096, 16)  # max block
    si.w(0, 24)     # min frame size (unknown)
    si.w(0, 24)     # max frame size
    si.w(sample_rate, 20)
    si.w(0, 3)      # channels - 1
    si.w(15, 5)     # bps - 1
    si.w(n, 36)
    head = b"fLaC" + bytes([0x80, 0, 0, 34]) + si.bytes() + md5

    # ---- frames (fixed 4096-sample blocks, VERBATIM subframe)
    out = bytearray(head)
    frame_idx = 0
    for start in range(0, n, 4096):
        block = samples[start : start + 4096]
        bs = len(block)
        f = BW()
        f.w(0b11111111111110, 14)  # sync
        f.w(0, 1)  # reserved
        f.w(0, 1)  # fixed blocksize stream
        f.w(7, 4)  # block size: 16 bit at end of header
        f.w(5, 4)  # sample rate: 16 kHz code
        f.w(0, 4)  # 1 channel
        f.w(4, 3)  # 16 bps
        f.w(0, 1)  # reserved
        assert frame_idx < 0x80
        f.w(frame_idx, 8)  # UTF-8 frame number (single byte)
        f.w(bs - 1, 16)
        f.w(0, 8)  # header CRC-8 (decoder does not verify)
        # subframe: 0 bit + type VERBATIM (000001) + no wasted bits
        f.w(0, 1)
        f.w(1, 6)
        f.w(0, 1)
        for s in block:
            f.w(int(s) & 0xFFFF, 16)
        f.align()
        f.w(0, 16)  # frame CRC-16 (unverified)
        out += f.bytes()
        frame_idx += 1
    return bytes(out)


def test_flac_roundtrip_verbatim():
    rng = np.random.default_rng(0)
    pcm = (rng.normal(size=10000) * 8000).astype(np.int16)
    blob = encode_flac_verbatim(pcm)
    samples, sr, bps, md5 = flac_decode(blob)
    assert sr == 16000 and bps == 16
    assert samples.shape == (10000, 1)
    np.testing.assert_array_equal(samples[:, 0].astype(np.int16), pcm)
    assert hashlib.md5(samples.astype("<i2").tobytes()).digest() == md5


def test_flac_rejects_garbage():
    with pytest.raises(ValueError):
        flac_decode(b"not a flac file at all")


def test_reference_flac_md5():
    """Decode real FLAC files (FIXED/LPC subframes) and verify the PCM MD5
    recorded in STREAMINFO — an end-to-end bit-exactness oracle."""
    import glob

    files = sorted(glob.glob("/root/reference/training/tests/test_data/*.flac"))
    if not files:
        pytest.skip("reference flac assets not available")
    for f in files[:4]:
        from caiman_asr_tpu.native import flac_decode_file

        samples, sr, bps, md5 = flac_decode_file(f)
        assert bps == 16
        assert hashlib.md5(samples.astype("<i2").tobytes()).digest() == md5


def test_levenshtein_native():
    assert levenshtein([1, 2, 3], [1, 2, 3]) == 0
    assert levenshtein([1, 2, 3], [1, 3]) == 1
    assert levenshtein([], [1, 2]) == 2
    assert levenshtein([1, 2, 3, 4], [4, 3, 2, 1]) == 4


def test_wer_uses_native():
    from caiman_asr_tpu.evaluate.wer import levenshtein as wer_lev

    assert wer_lev("kitten", "sitting") == 3
    assert wer_lev(["a", "b"], ["b"]) == 1


def test_read_audio_flac(tmp_path):
    from caiman_asr_tpu.data.audio import read_audio

    rng = np.random.default_rng(1)
    pcm = (rng.normal(size=5000) * 8000).astype(np.int16)
    (tmp_path / "x.flac").write_bytes(encode_flac_verbatim(pcm))
    audio = read_audio(tmp_path / "x.flac", 16000)
    np.testing.assert_allclose(audio, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_audio_staging_semantics():
    """Native staging: partial buffers wait, carries thread, EOS drains with
    zero-padding, reset clears (mirrors engine.py's Python staging loop).
    Buffers are int16 PCM (the wire format)."""
    from caiman_asr_tpu.native import AudioStaging

    B, carry, hop = 3, 4, 8
    stg = AudioStaging(B, carry, hop)
    staging = np.zeros((B, carry + hop), np.int16)
    active = np.array([1, 1, 0], np.uint8)
    closed = np.zeros(B, np.uint8)

    # lane 0: exactly one hop; lane 1: partial (waits); lane 2: inactive
    stg.push(0, np.arange(1, hop + 1, dtype=np.int16))
    stg.push(1, np.ones(3, np.int16))
    adv, fin = stg.tick(staging, active, closed)
    assert adv.tolist() == [True, False, False] and not fin.any()
    np.testing.assert_array_equal(staging[0, :carry], np.zeros(carry))
    np.testing.assert_array_equal(staging[0, carry:], np.arange(1, hop + 1))
    assert stg.buffered(1) == 3

    # carry = last `carry` samples of the previous row
    stg.push(0, np.full(hop, 9, np.int16))
    adv, _ = stg.tick(staging, active, closed)
    assert adv[0]
    np.testing.assert_array_equal(
        staging[0, :carry], np.arange(hop - carry + 1, hop + 1)
    )

    # closing lane 1 drains its partial buffer zero-padded, then finishes
    closed[1] = 1
    adv, fin = stg.tick(staging, active, closed)
    assert adv[1] and not fin[1]
    np.testing.assert_array_equal(
        staging[1, carry : carry + 3], np.ones(3)
    )
    np.testing.assert_array_equal(staging[1, carry + 3 :], np.zeros(hop - 3))
    adv, fin = stg.tick(staging, active, closed)
    assert not adv[1] and fin[1]

    # reset clears buffer and carry
    stg.push(0, np.ones(2, np.int16))
    stg.reset_lane(0)
    assert stg.buffered(0) == 0
    closed[0] = 1
    adv, fin = stg.tick(staging, active, closed)
    assert fin[0]


def test_audio_staging_float_conversion_and_rows():
    """Float pushes convert (round + clamp) to int16 at the boundary;
    push_rows delivers row i to lane i (or lanes[i]) in one call."""
    from caiman_asr_tpu.native import AudioStaging

    B, carry, hop = 3, 2, 4
    stg = AudioStaging(B, carry, hop)
    staging = np.zeros((B, carry + hop), np.int16)
    active = np.ones(B, np.uint8)
    closed = np.zeros(B, np.uint8)

    # float -> int16: round-to-nearest and clamp at full scale
    stg.push(0, np.array([0.5, -0.5, 1.5, -1.5], np.float32))
    adv, _ = stg.tick(staging, active, closed)
    assert adv[0] and not adv[1]
    np.testing.assert_array_equal(
        staging[0, carry:], [16384, -16384, 32767, -32768]
    )

    # batched rows: int16 block straight through, explicit lane mapping
    block = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.int16)
    stg.push_rows(block, lanes=np.array([2, 1], np.int32))
    adv, _ = stg.tick(staging, active, closed)
    assert adv[1] and adv[2]
    np.testing.assert_array_equal(staging[2, carry:], [1, 2, 3, 4])
    np.testing.assert_array_equal(staging[1, carry:], [5, 6, 7, 8])

    # float rows convert like scalar pushes; default lanes = row index
    fblock = np.array([[0.25, 0.0, -0.25, 1.0]] * B, np.float32)
    stg.push_rows(fblock)
    adv, _ = stg.tick(staging, active, closed)
    assert adv.all()
    np.testing.assert_array_equal(
        staging[0, carry:], [8192, 0, -8192, 32767]
    )


def test_serializer_rejects_wide_beam():
    """ser_init bounds beam_width to its fixed liveness array (<=64); an
    unbounded CLI value must raise, not overrun the stack."""
    from caiman_asr_tpu.native import ResponseSerializer

    with pytest.raises(ValueError):
        ResponseSerializer(4, 65, 8, 0.06, ["a", "b"])
    with pytest.raises(ValueError):
        ResponseSerializer(4, 0, 8, 0.06, ["a"])
    ser = ResponseSerializer(4, 64, 8, 0.06, ["a", "b"])  # max width OK
    ser.close()


def test_serializer_instances_are_independent():
    """Instance-handle C state: two live serializers keep separate per-lane
    commit state (the multi-chip server runs one per device), and a
    close()d instance raises on use instead of touching freed memory."""
    from caiman_asr_tpu.native import ResponseSerializer

    a = ResponseSerializer(2, 1, 1, 0.06, ["x"])
    b = ResponseSerializer(2, 1, 1, 0.06, ["y"])
    # advance a greedy tick on `a` only: frame indices must diverge
    packed = np.array([[0, 1], [0, 0]], np.int32)  # [cap=1 tok | count]
    adv = np.array([1, 1], np.uint8)
    a.greedy_tick(packed, adv)
    assert a.frame_idx(0) == 1 and b.frame_idx(0) == 0
    # and b detokenizes with its own piece table
    recs = b.greedy_tick(packed, adv)
    assert "y" in recs[0][0]
    a.close()
    a.close()  # idempotent
    with pytest.raises(ValueError):
        a.greedy_tick(packed, adv)
    # b is unaffected by a's close
    assert b.frame_idx(0) == 1
    b.close()
