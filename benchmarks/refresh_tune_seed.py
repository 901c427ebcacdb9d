"""Refresh the packaged tunecache seed from this machine's race results.

Run AFTER the last kernel edit of a release, after a full bench +
tests_tpu pass on the target device has populated the writable cache
(``$MINIDIFF_TPU_TUNE_CACHE``):

    python benchmarks/refresh_tune_seed.py

Copies every family file whose fingerprint still matches the CURRENT
kernel sources into ``minidiff_tpu/kernels/tune_seed/`` (the packaged
read-only tier ``tunecache._seed_file`` consults on a miss).  Stale
files — raced before a kernel changed — are skipped loudly: shipping
them would be harmless (the fingerprint gate ignores them at load) but
useless.  Files for other device kinds are copied as-is; lookups are
device-tagged so they can only ever serve their own hardware.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minidiff_tpu.kernels import tunecache  # noqa: E402


def main() -> None:
    src_root = tunecache._root()
    if src_root is None or not os.path.isdir(src_root):
        print(f"no writable tune cache at {src_root!r} — run the bench "
              "and tests_tpu first")
        return
    dst_root = os.path.join(
        os.path.dirname(os.path.abspath(tunecache.__file__)), "tune_seed")
    os.makedirs(dst_root, exist_ok=True)
    copied, stale = [], []
    for name in sorted(os.listdir(src_root)):
        if not name.endswith(".json"):
            continue
        if name.endswith("_cpu.json"):
            # never seed CPU decisions: the CPU path exists for tests,
            # which deliberately exercise the race itself
            continue
        path = os.path.join(src_root, name)
        try:
            with open(path) as fh:
                d = json.load(fh)
        except Exception as e:
            print(f"SKIP {name}: unreadable ({e})")
            continue
        fp = d.get("__fingerprint__")
        # family name = everything before the device tag; recover it by
        # matching known family fingerprints (cheap: try the prefix walk)
        fam = None
        parts = name[:-5].split("_")
        for i in range(len(parts), 0, -1):
            cand = "_".join(parts[:i])
            try:
                if tunecache._fingerprint(cand) == fp:
                    fam = cand
                    break
            except Exception:
                continue
        if fam is None:
            stale.append(name)
            print(f"SKIP {name}: fingerprint does not match current "
                  "kernel sources (stale — re-race before seeding)")
            continue
        shutil.copy2(path, os.path.join(dst_root, name))
        copied.append(name)
        print(f"seeded {name} ({len(d) - 1} decisions)")
    print(f"\n{len(copied)} file(s) seeded into {dst_root}; "
          f"{len(stale)} stale skipped")


if __name__ == "__main__":
    main()
