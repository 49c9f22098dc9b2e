"""Garbage-collect stale entries from the durable TPU compile cache.

The repo-committed ``.tpu_cache/`` is what lets a cold ``bench.py``
process deserialize its executables in milliseconds instead of paying
5-8 minute remote compiles (see scripts/warm_bench_rungs.py). Entries
from superseded program versions are never evicted by JAX, so the dir
compounds every round (112 MB after round 4). This script implements a
mark-and-sweep:

    python scripts/gc_tpu_cache.py mark      # set every entry's atime to epoch
    # ... run everything that must stay warm:
    #     python scripts/warm_bench_rungs.py
    #     timeout 600 python bench.py
    #     python -c 'import __graft_entry__ as g; g.entry(); g.dryrun_multichip(8)'
    python scripts/gc_tpu_cache.py sweep     # delete entries never read since mark

The mechanism rides ext4 ``relatime`` semantics: a read updates atime
whenever atime < mtime, and ``mark`` forces atime to 1970 (< any mtime),
so exactly the entries the retained workloads deserialize get a fresh
atime. ``sweep`` refuses to run if nothing was read since ``mark``
(which would wipe the whole cache — e.g. when the ritual was skipped or
the tunnel was down).

``sweep --dry-run`` only reports. Run ``git add -A .tpu_cache`` after a
real sweep so the deletions land in the snapshot.
"""

import argparse
import os
import sys

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".tpu_cache")
EPOCH_MARK = 86400  # 1970-01-02, sentinel "unread since mark"


def entries():
    for name in sorted(os.listdir(CACHE)):
        path = os.path.join(CACHE, name)
        if os.path.isfile(path):
            yield name, path


def mark():
    n = 0
    for _, path in entries():
        st = os.stat(path)
        os.utime(path, (EPOCH_MARK, st.st_mtime))
        n += 1
    print(f"marked {n} entries (atime -> epoch)")


def sweep(dry_run: bool):
    read, unread = [], []
    for name, path in entries():
        st = os.stat(path)
        (read if st.st_atime > EPOCH_MARK + 1 else unread).append((name, path, st.st_size))
    if not read:
        print("refusing to sweep: NO entry was read since mark — did the "
              "warm ritual run? (a sweep now would delete the entire cache)")
        sys.exit(1)
    freed = sum(s for _, _, s in unread)
    for name, path, size in unread:
        print(f"{'would delete' if dry_run else 'delete'}: {name} ({size // 1024} KB)")
        if not dry_run:
            os.remove(path)
    kept = sum(s for _, _, s in read)
    print(f"{'dry-run: ' if dry_run else ''}kept {len(read)} entries "
          f"({kept // (1024 * 1024)} MB), "
          f"{'would free' if dry_run else 'freed'} {len(unread)} entries "
          f"({freed // (1024 * 1024)} MB)")


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("phase", choices=["mark", "sweep"])
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    if not os.path.isdir(CACHE):
        print(f"no cache dir at {CACHE}")
        sys.exit(1)
    if args.phase == "mark":
        mark()
    else:
        sweep(args.dry_run)


if __name__ == "__main__":
    main()
