"""Generate tests/fixtures/linked_bc.lz4 with the REAL liblz4 encoder.

The fixture is an LZ4 frame with linked blocks + block checksums +
content size + content checksum over tests/test_lz4_interop.py's PAYLOAD
— the feature set roslz4/lz4-CLI bags can carry that our own encoder
never emits (ADVICE r3). Committed so the interop test runs even where
liblz4 is absent. Regenerate only if PAYLOAD changes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_lz4_interop import FIXTURE, PAYLOAD, _real_lz4_frame


def main() -> None:
    frame = _real_lz4_frame(
        PAYLOAD, linked=True, block_checksum=True, content_checksum=True,
        content_size=True,
    )
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "wb") as f:
        f.write(frame)
    print(f"wrote {FIXTURE} ({len(frame)} bytes for {len(PAYLOAD)} input)")


if __name__ == "__main__":
    main()
