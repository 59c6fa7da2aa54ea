"""Import reference-published test vectors into tests/fixtures/.

These are DATA (expected outputs pinned by the reference's own test suite),
not code: the golden pinned-vk string is the `r#"..."#` literal asserted at
halo2_proofs/tests/plonk_api.rs:659-1141.  Re-run if the reference snapshot
changes.

Usage: python tools/extract_fixtures.py [/path/to/reference]
"""

import re
import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    ref = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
    src = (ref / "halo2_proofs/tests/plonk_api.rs").read_text()
    m = re.search(r'r#"(PinnedVerificationKey \{.*?\})"#', src, re.S)
    if not m:
        raise SystemExit("golden pinned-vk literal not found")
    out = REPO / "tests/fixtures/plonk_api_pinned_vk_ipa_vesta_k5.txt"
    out.write_text(m.group(1))
    print(f"wrote {out} ({len(m.group(1))} bytes)")


if __name__ == "__main__":
    main()
