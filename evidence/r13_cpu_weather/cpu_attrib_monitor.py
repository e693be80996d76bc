"""Sample per-process utime/stime every interval, attribute system-wide
user CPU to process groups (java / pyspark workers / other python / rest).
Diagnostic for the r13 skewsmall cpu bimodality - NOT part of the engine.
Writes JSONL; each line = one sample with aggregate utime ticks per group
plus /proc/stat user+nice and a sample of cpu MHz.
"""
import json
import os
import sys
import time

HZ = os.sysconf("SC_CLK_TCK")


def proc_stat_user():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return (int(parts[1]) + int(parts[2])) / HZ


def cpu_mhz():
    vals = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("cpu mhz"):
                    vals.append(float(line.split(":")[1]))
    except OSError:
        pass
    return round(sum(vals) / len(vals), 1) if vals else None


def sample():
    groups = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                st = f.read()
            with open(f"/proc/{pid}/cmdline") as f:
                cmd = f.read().replace("\0", " ")
        except OSError:
            continue
        # comm may contain spaces/parens; fields after the LAST ')'
        rest = st.rsplit(")", 1)[1].split()
        utime, stime = int(rest[11]) / HZ, int(rest[12]) / HZ
        if "java" in cmd.split(" ", 1)[0]:
            g = "java"
        elif "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            g = "pyworker"
        elif "bench_imaging" in cmd:
            g = "bench_driver"
        elif "python" in cmd:
            g = "other_python"
        else:
            g = "rest"
        agg = groups.setdefault(g, [0.0, 0.0, 0])
        agg[0] += utime
        agg[1] += stime
        agg[2] += 1
    return groups


def main():
    out = sys.argv[1]
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    with open(out, "w") as f:
        while True:
            rec = {
                "t": round(time.time(), 1),
                "stat_user": round(proc_stat_user(), 1),
                "mhz": cpu_mhz(),
                "groups": {
                    k: {"u": round(v[0], 1), "s": round(v[1], 1), "n": v[2]}
                    for k, v in sample().items()
                },
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            time.sleep(interval)


if __name__ == "__main__":
    main()
