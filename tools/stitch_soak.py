#!/usr/bin/env python3
"""Stitch per-batch soak records into one SOAK JSON.

The x1000 grid runs in batches (one JVM each) so a late failure can't
erase finished pipelines; each batch writes its own SOAK_*.json (or, if
the JVM died, its completed rows survive as stderr `[soak] "name":{...}`
lines). This merges them in pipeline order, last-writer-wins, and stamps
the source batch + heap per pipeline so spliced reruns stay visible —
the r9 rerun_note convention, mechanized.

Usage: stitch_soak.py OUT header_sf header_scales_csv IN1 [IN2 ...]
  INx: path to a batch SOAK json, or  name=path.log  to grep [soak]
       fragments out of a log file. Later inputs override earlier ones.
  A `#note:name=text` arg attaches a rerun/ceiling note to a pipeline.
"""
import json
import re
import sys

PIPE_ORDER = [
    "lsh_dedup", "pack_sequences", "tiled_erosion3d", "volume_zoom3d",
    "semdedup", "kmeans_train", "remove_dup_spans", "gap_fill",
    "sparse_cosine", "interval_join", "fuzzy_join", "ivfpq",
    "hamming_join", "edt3d", "label3d_cc", "topk_per_group",
]
META = {"sf", "scales", "cores", "heap_g"}


def load_records(path):
    """Yield (name, record, heap_g_or_None) from a soak json or a log."""
    if path.endswith(".log"):
        for line in open(path, encoding="utf-8", errors="replace"):
            m = re.search(r'\[soak\] (".+)$', line)
            if m:
                frag = json.loads("{" + m.group(1).strip() + "}")
                for k, v in frag.items():
                    yield k, v, None
    else:
        d = json.load(open(path))
        heap = d.get("heap_g")
        for k, v in d.items():
            if k not in META:
                yield k, v, heap


def main():
    out_path, sf, scales_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    merged, notes = {}, {}
    for arg in sys.argv[4:]:
        if arg.startswith("#note:"):
            name, text = arg[6:].split("=", 1)
            notes[name] = text
            continue
        for name, rec, heap in load_records(arg):
            rec = dict(rec)
            rec["src"] = arg.rsplit("/", 1)[-1]
            if heap is not None:
                rec["heap_g"] = heap
            merged[name] = rec
    for name, text in notes.items():
        if name in merged:
            merged[name]["note"] = text
        else:
            merged[name] = {"note": text}
    body = {
        "sf": sf,
        "scales": [int(x) for x in scales_csv.split(",")],
        "cores": 32,
    }
    for name in PIPE_ORDER:
        if name in merged:
            body[name] = merged[name]
    for name in merged:
        if name not in body:
            body[name] = merged[name]
    with open(out_path, "w") as f:
        json.dump(body, f, separators=(",", ":"))
        f.write("\n")
    print(f"wrote {out_path}: {len(merged)} pipelines")


if __name__ == "__main__":
    main()
