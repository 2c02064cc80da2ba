"""Print top device ops from a jax.profiler trace (xprof converter).

Usage:
    python tools/tpuprof.py /tmp/trace_dir [-k 15]

Pairs with ``jax.profiler.trace(dir)`` around the region of interest. Works
without TensorBoard: feeds the xplane.pb through xprof's raw_to_tool_data.
"""

import argparse
import glob
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("-k", type=int, default=15)
    args = ap.parse_args()

    pbs = sorted(glob.glob(args.trace_dir + "/**/*.xplane.pb", recursive=True))
    if not pbs:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    from xprof.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data([pbs[-1]], "framework_op_stats", {})
    tables = data if isinstance(data, list) else json.loads(data)
    tbl = tables[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(cols, [c["v"] if isinstance(c, dict) else c
                            for c in r["c"]])) for r in tbl["rows"]]
    dev = [r for r in rows if r.get("host_or_device") == "Device"]
    dev.sort(key=lambda r: -float(r.get("total_self_time", 0) or 0))
    print(f"{'self_us':>10} {'%dev':>6} {'occ':>5}  {'bound':>8}  operation")
    for r in dev[: args.k]:
        print(f"{float(r['total_self_time']):10.1f} "
              f"{float(r['device_total_self_time_percent'] or 0)*100:6.1f} "
              f"{int(r['occurrences']):5d}  {str(r.get('bound_by','')):>8}  "
              f"{r['operation'][:90]}")


if __name__ == "__main__":
    main()
