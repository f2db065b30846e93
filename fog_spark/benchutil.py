"""Box-health telemetry for benchmark runs.

This sandbox's wall-clock numbers are only meaningful with evidence
about what the box was doing: hypervisor steal explains some episodes
(BASELINE.md r2-r4), but round 4 produced 4-6x blowups at <2.4% steal
that steal alone cannot certify. Three additional signals close the
gap:

- ``/proc/pressure/{cpu,memory,io}`` (PSI): total stall time in us —
  cgroup throttling and memory-bandwidth contention show here even
  when the steal counter is quiet.
- foreign CPU: busy ticks consumed by processes OUTSIDE this
  process tree (e.g. an orphaned JVM from a timeout-killed earlier
  invocation pinning cores shows as foreign user time, NOT steal).
- cgroup v2 ``cpu.stat`` throttling counters when readable.

All readers return {} on boxes without the file — telemetry must never
break the bench.
"""

from __future__ import annotations

import os


def cpu_stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def pressure() -> dict[str, int]:
    """total stall microseconds per PSI resource ('some' line)."""
    out = {}
    for res in ("cpu", "memory", "io"):
        try:
            with open(f"/proc/pressure/{res}") as f:
                for line in f:
                    if line.startswith("some"):
                        out[res] = int(line.rsplit("total=", 1)[1])
                        break
        except OSError:
            pass
    return out


def cgroup_throttle() -> dict[str, int]:
    """cpu.stat throttling counters (v1 ns / v2 usec, normalized to usec)."""
    out = {}
    for path, key, scale in (
        ("/sys/fs/cgroup/cpu/cpu.stat", "throttled_time", 1000),  # v1: ns
        ("/sys/fs/cgroup/cpu.stat", "throttled_usec", 1),  # v2: usec
    ):
        try:
            with open(path) as f:
                for line in f:
                    k, v = line.split()
                    if k == "nr_throttled":
                        out["nr_throttled"] = int(v)
                    elif k == key:
                        out["throttled_usec"] = int(v) // scale
            if out:
                return out
        except OSError:
            continue
    return out


def _tree_ticks(root_pid: int) -> int:
    """utime+stime ticks of root_pid's whole process tree (incl. the
    reaped-children aggregate cutime/cstime of still-live members)."""
    children: dict[int, list[int]] = {}
    stats: dict[int, int] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # comm can contain spaces/parens: split after the LAST ')'
        rest = raw.rsplit(")", 1)[1].split()
        pid = int(pid_s)
        ppid = int(rest[1])
        stats[pid] = int(rest[11]) + int(rest[12])  # utime + stime
        children.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [root_pid], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += stats.get(p, 0)
        stack.extend(children.get(p, []))
    return total


class BoxMeter:
    """Delta-reads all signals around a measured region."""

    def __init__(self, root_pid: int | None = None):
        self.root_pid = root_pid if root_pid is not None else os.getpid()

    def start(self) -> None:
        self._c0 = cpu_stat()
        self._p0 = pressure()
        self._t0 = cgroup_throttle()
        self._mine0 = _tree_ticks(self.root_pid)

    def stop(self) -> dict:
        c1 = cpu_stat()
        d = [b - a for a, b in zip(self._c0, c1)]
        total = max(sum(d), 1)
        busy = total - d[3] - d[4]  # minus idle, iowait
        mine = _tree_ticks(self.root_pid) - self._mine0
        p1, t1 = pressure(), cgroup_throttle()
        out = {
            "steal_pct": round(100.0 * d[7] / total, 2),
            # busy CPU NOT attributable to our process tree: an orphaned
            # JVM or a sibling workload shows here, not in steal
            "foreign_cpu_pct": round(100.0 * max(busy - mine, 0) / total, 2),
        }
        for k, v in p1.items():
            if k in self._p0:
                out[f"psi_{k}_ms"] = round((v - self._p0[k]) / 1000.0, 1)
        if t1 and self._t0:
            dt = t1.get("throttled_usec", 0) - self._t0.get("throttled_usec", 0)
            out["cg_throttled_ms"] = round(dt / 1000.0, 1)
        return out


def foreign_busy_pct(sample_s: float = 1.0, root_pid: int | None = None) -> float:
    """One-shot sample of foreign busy CPU%, for the pre-bench guard."""
    import time

    m = BoxMeter(root_pid)
    m.start()
    time.sleep(sample_s)
    return m.stop()["foreign_cpu_pct"]
