#!/usr/bin/env python3
"""Merge per-query rows from a targeted ScaleProbe output into the
round's SCALE artifact: queries sorted, _meta first, _-extras last."""
import json, sys

def main(dst, *srcs):
    base = json.load(open(dst))
    for s in srcs:
        for k, v in json.load(open(s)).items():
            if k == "_meta":
                continue
            if k.startswith("_") and "error" in v:
                continue  # keep the existing good extra over a failed re-run
            base[k] = v
    meta = base.pop("_meta")
    extras = {k: base.pop(k) for k in sorted(k for k in base if k.startswith("_"))}
    out = {"_meta": meta}
    out.update({k: base[k] for k in sorted(base)})
    out.update(extras)
    json.dump(out, open(dst, "w"), indent=1)
    open(dst, "a").write("\n")
    print(f"merged {len(srcs)} file(s) into {dst}: {len(out)-1-len(extras)} queries")

if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
