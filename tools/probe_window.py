"""Probe the host window before a scaling attempt (see scaling-run-protocol).

Good launch window per BENCH_SCALING.json history: cpu_ratio >= 3.3 AND
membw[1] <= ~0.11 (saturated bus). Quiet bus (membw1 >= 0.2) deflates raw
1v4 efficiency to ~0.71-0.78 even with perfect software.
"""
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import bench
    cpu = bench.cpu_capacity((1, 4))
    bw = bench.mem_bandwidth_capacity((1, 4))
    out = {
        "cpu": cpu,
        "membw": bw,
        "cpu_ratio": round(cpu[4] / cpu[1], 3) if cpu.get(1) else None,
        "good_window": bool(cpu.get(1) and cpu[4] / cpu[1] >= 3.3 and bw.get(1, 1.0) <= 0.13),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
