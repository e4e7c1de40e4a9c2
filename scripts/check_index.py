"""CLI for the offline index validator (CheckIndex.java:113 role).

Usage: python scripts/check_index.py [--exorcise] <index_dir> [...]

Exit code 0 when every index is clean; 1 with a problem listing
otherwise. With --exorcise (CheckIndex.java:4079 exorciseIndex), a
failing index gets a new commit generation excluding its corrupt
segments — the documents they held are LOST, the survivors serve again.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    from lucene_ray.index.check import (CheckIndexError, check_index,
                                        check_vector_index)

    def _is_vector(d: str) -> bool:
        return any(
            os.path.exists(os.path.join(d, n))
            for n in ("vector_manifest.json", "pq_manifest.json",
                      "ivfpq_manifest.json", "sq_manifest.json")
        )

    exorcise = "--exorcise" in argv
    argv = [a for a in argv if a != "--exorcise"]
    # per-directory success flags: a later directory's successful
    # exorcise+recheck must not mask an earlier directory's failure
    ok = {}
    for d in argv:
        try:
            rep = (check_vector_index(d) if _is_vector(d)
                   else check_index(d, verbose=True))
            print(f"OK    {d}: {rep}")
            ok[d] = True
        except CheckIndexError as e:
            ok[d] = False
            print(f"FAIL  {d}:\n{e}")
            if exorcise and not _is_vector(d):
                from lucene_ray.index.check import exorcise_index

                rep = exorcise_index(d)
                print(f"EXORCISED  {d}: dropped {len(rep['dropped'])} "
                      f"segment(s), now gen {rep['generation']} with "
                      f"{rep['doc_count']} docs")
                try:
                    check_index(d)
                    ok[d] = True
                except CheckIndexError as e2:
                    print(f"STILL FAIL  {d}:\n{e2}")
    return 0 if all(ok.values()) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
