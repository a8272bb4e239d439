"""GFA1 dump — reference: GFADump (src/GFADump.cc:8,160-289).

The reference writes two files: <prefix>_lines.gfa (per-line coloring)
and <prefix>_raw.gfa (canonical edges as S records, links from both
orientations).  Round-1 implements the raw form; line coloring follows
with the full Lines decomposition.
"""

from __future__ import annotations

import numpy as np

from ..core.dna import codes_to_seq


def gfa_dump(hbv, path_prefix: str, write_seq: bool = True):
    """Write <path_prefix>_raw.gfa: S per canonical edge pair (the lower
    id of (e, inv[e])), L links with orientations, K-1 overlap."""
    E = hbv.n_edges
    inv = hbv.inv
    canon = np.minimum(np.arange(E), inv)
    k = hbv.k
    with open(path_prefix + "_raw.gfa", "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for e in range(E):
            if canon[e] != e:
                continue
            seq = codes_to_seq(hbv.edge_seq(e)) if write_seq else "*"
            f.write(f"S\t{e}\t{seq}\tLN:i:{hbv.edge_len(e)}\n")
        links = set()
        fo, fe, to, te = hbv.vertex_csr()
        for e1 in range(E):
            v = hbv.to_right[e1]
            outs = fe[fo[v] : fo[v + 1]]
            c1 = int(canon[e1])
            o1 = "+" if c1 == e1 else "-"
            for e2 in outs:
                c2 = int(canon[e2])
                o2 = "+" if c2 == e2 else "-"
                key = (c1, o1, c2, o2)
                # dedupe against the rc-mirrored link
                mkey = (
                    c2,
                    "+" if o2 == "-" else "-",
                    c1,
                    "+" if o1 == "-" else "-",
                )
                if mkey in links:
                    continue
                links.add(key)
        for c1, o1, c2, o2 in sorted(links):
            f.write(f"L\t{c1}\t{o1}\t{c2}\t{o2}\t{k-1}M\n")
