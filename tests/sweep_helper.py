"""Exhaustive adversarial sweep over the media/WARC parser seed
corpus, run as a SUBPROCESS under a hard address-space cap (see
test_fuzz_parsers.test_exhaustive_sweeps_capped).

Two systematic mutation families complement the random fuzz:

* truncation at every (or evenly-spaced) byte position plus one-byte
  flips to 0x00 / 0xFF / +1 — hits every ``check then read`` seam;
* 4-byte 0xFFFFFFFF / 0x7FFFFFFF / zero and 2-byte 0xFFFF field
  patches at every position — the shape of count/dimension/offset
  fields, which is how the hostile-stsc memory bomb was found (a
  first_chunk near 2^32 expanded to a multi-GB list; the cap turns
  any such regression into a MemoryError instead of a host OOM).

Exit code 0 + the CLEAN markers on stdout mean every decoder returned
(None or a value) for every mutation without raising and without
breaching the cap.
"""
import os
import resource
import sys

resource.setrlimit(resource.RLIMIT_AS, (6 << 30, 6 << 30))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import test_fuzz_parsers as tfp


def truncations_and_flips(rng, seed_blob: bytes, n: int):
    L = len(seed_blob)
    positions = range(L) if L <= 400 else range(0, L, max(1, L // 400))
    for p in positions:
        yield seed_blob[:p]
        for v in (0x00, 0xFF, (seed_blob[p] + 1) & 0xFF):
            b = bytearray(seed_blob)
            b[p] = v
            yield bytes(b)
        b = bytearray(seed_blob[: p + 1])
        b[p] = 0xFF
        yield bytes(b)


def field_patches(rng, seed_blob: bytes, n: int):
    L = len(seed_blob)
    positions = range(L) if L <= 400 else range(0, L, max(1, L // 400))
    patches = (b"\xff\xff\xff\xff", b"\x7f\xff\xff\xff",
               b"\x00\x00\x00\x00", b"\xff\xff")
    for p in positions:
        for pat in patches:
            b = bytearray(seed_blob)
            b[p:p + len(pat)] = pat[: max(0, L - p)] or pat
            yield bytes(b)


if __name__ == "__main__":
    tfp._mutations = truncations_and_flips
    tfp.test_media_decoders_never_raise()
    print("TRUNCATION SWEEP CLEAN")
    tfp._mutations = field_patches
    tfp.test_media_decoders_never_raise()
    tfp.test_warc_parser_never_raises()
    print("FIELD-PATCH SWEEP CLEAN")
