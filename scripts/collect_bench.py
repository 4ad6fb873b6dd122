"""Collect bench log outputs into the repo's BENCH_*.json artifacts."""

import json
import sys


def last_json(path):
    out = None
    try:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    out = json.loads(line)
    except OSError:
        pass
    return out


def main():
    pairs = {
        "/tmp/bench_k13_post.log": "BENCH_K13.json",
        "/tmp/bench_k15.log": "BENCH_K15.json",
        "/tmp/bench_k17.log": "BENCH_K17.json",
        "/tmp/bench_k21.log": "BENCH_K21.json",
        "/tmp/bench_large.log": "BENCH_LARGE.json",
        "/tmp/bench_large_k13.log": "BENCH_LARGE_K13_DEGENERATE.json",
    }
    for src, dst in pairs.items():
        data = last_json(src)
        if data is None:
            print(f"skip {dst}: no result in {src}")
            continue
        with open(f"/root/repo/{dst}", "w") as fh:
            json.dump(data, fh)
            fh.write("\n")
        print(f"wrote {dst}: {data['value']} {data['unit']}")


if __name__ == "__main__":
    main()
