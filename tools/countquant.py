"""QP histogram / size stats from 2-pass stat files.

Reference: tools/countquant_x264.pl (QP usage + per-QP size from the
ratecontrol stat log). Ours reads the files written by
encoder/ratecontrol.py (`--pass 1 --stats FILE`).

    python tools/countquant.py pcamv_2pass.log
"""

from __future__ import annotations

import sys
from collections import defaultdict


def main(path: str) -> None:
    qp_count: dict[int, int] = defaultdict(int)
    qp_bits: dict[int, int] = defaultdict(int)
    type_count: dict[str, int] = defaultdict(int)
    total_bits = 0
    n = 0
    for line in open(path):
        d = dict(tok.split(":") for tok in line.split())
        qp = int(d["qp"])
        bits = int(d["bits"])
        qp_count[qp] += 1
        qp_bits[qp] += bits
        type_count[d["type"]] += 1
        total_bits += bits
        n += 1
    if not n:
        print("empty stat file")
        return
    print(f"{n} frames, {total_bits / 8 / 1000:.1f} kB total, "
          f"types: " + " ".join(f"{t}:{c}" for t, c in
                                sorted(type_count.items())))
    print(f"{'qp':>4} {'frames':>7} {'%':>6} {'avg bytes':>10}")
    for qp in sorted(qp_count):
        c = qp_count[qp]
        print(f"{qp:>4} {c:>7} {100.0 * c / n:>5.1f}% "
              f"{qp_bits[qp] / 8 / c:>10.1f}")
    avg_qp = sum(q * c for q, c in qp_count.items()) / n
    print(f"average qp: {avg_qp:.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pcamv_2pass.log")
