"""Alternative PSMC reader with rate re-estimation (reference psmc.py).

Parses the psmc text format including the ``MM pattern:`` discretisation
line, and re-estimates a constant coalescence rate per merged interval by
time-weighted harmonic averaging; the open-ended last interval is fitted by
matching the expected coalescence time (reference psmc.py:97-154).
Host-side pure Python (runs once per fit on tiny inputs).
"""

from __future__ import annotations

from math import exp, inf

from scipy.optimize import least_squares


class PSMC:
    def __init__(self, input_file: str, rd: int = -1):
        self.times: list = []
        self.eps: list = []
        self.pattern: list = []
        self.theta = 0.0
        self.rho = 0.0
        self.rd = rd
        if input_file:
            self._read(input_file, rd)

    def _read(self, fn: str, rd: int) -> None:
        max_rd = -1
        with open(fn) as f:
            for line in f:
                parts = line.split()
                if parts and parts[0] == "RD":
                    max_rd = int(parts[1])
        if max_rd == -1:
            raise ValueError(f"Corrupted or empty input file: {fn}")
        if rd == -1 or rd > max_rd:
            rd = max_rd
        self.rd = rd

        with open(fn) as f:
            it = iter(f)
            for line in it:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "MM" and len(parts) > 1 and parts[1].startswith("pattern"):
                    pat = parts[1][:-1].split(":")[1]
                    for p in pat.split("+"):
                        nums = [int(v) for v in p.split("*")]
                        if len(nums) == 1:
                            self.pattern.append(nums[0])
                        else:
                            self.pattern += [nums[1]] * nums[0]
                if parts[0] != "RD" or int(parts[1]) != rd:
                    continue
                while parts[0] != "RS":
                    if parts[0] == "TR":
                        self.theta = float(parts[1])
                        self.rho = float(parts[2])
                    parts = next(it).split()
                while parts[0] != "PA":
                    if parts[0] != "RS":
                        raise ValueError("Unexpected line in psmc file.")
                    self.times.append(float(parts[2]))
                    self.eps.append(float(parts[3]))
                    parts = next(it).split()
                break

    def change_theta(self, theta: float) -> None:
        self.times = [v * self.theta / theta for v in self.times]
        self.eps = [v * self.theta / theta for v in self.eps]
        self.rho = self.rho / self.theta * theta
        self.theta = theta

    def collapse_pattern(self) -> list:
        times = []
        counter = 0
        for el in self.pattern:
            times.append(self.times[counter])
            counter += el
        return times

    def average_coalescent_rate(self, t1: float, t2: float) -> float:
        """Time-weighted harmonic average of the EPS over [t1, t2)."""
        if t1 > t2:
            raise ValueError("t1 > t2")
        times = self.times + [inf]
        ci = 0
        while times[ci] <= t1:
            ci += 1
        ci -= 1
        av = 0.0
        tt = 0.0
        while ci < len(times) - 1 and times[ci] < t2:
            tu = min(t2, times[ci + 1])
            tl = max(t1, times[ci])
            av += tu / self.eps[ci] - tl / self.eps[ci]
            tt += tu - tl
            ci += 1
        return tt / av

    def fit_coalescent_time(self, t1: float, t2: float) -> float:
        """Fit a constant rate on the open-ended interval by matching the
        conditional expected coalescence time (reference psmc.py:120-147)."""
        if t1 > t2:
            raise ValueError("t1 > t2")
        times = self.times + [inf]
        ci = 0
        while times[ci] <= t1:
            ci += 1
        ci -= 1
        pnc = 0.0
        et = 0.0
        tt = 0.0
        while ci < len(times) - 1 and times[ci] < t2:
            tu = min(t2, times[ci + 1])
            tl = max(t1, times[ci])
            ru = tu / self.eps[ci]
            rl = tl / self.eps[ci]
            vu = 0.0 if ru == inf else (ru + 1.0) * exp(rl - ru)
            et += exp(pnc) * ((rl + 1.0) - vu) * self.eps[ci]
            pnc -= ru - rl
            tt += tu - tl
            ci += 1
        et = et / (1.0 - exp(pnc))
        sol = least_squares(
            lambda l: (et - t1) - self.expected_coal_time(l, tt), 1.0,
            bounds=(0.0, inf), ftol=4e-16, xtol=4e-16, gtol=4e-16,
        )
        return float(sol.x[0])

    @staticmethod
    def expected_coal_time(l, t):
        if t == inf:
            return l
        r = t / l
        return (1.0 - exp(-r) * (r + 1.0)) * l / (1.0 - exp(-r))

    def reestimate_coalescent_rates(self, times: list) -> list:
        et = [self.average_coalescent_rate(t1, t2)
              for t1, t2 in zip(times[:-1], times[1:])]
        et.append(self.fit_coalescent_time(times[-1], inf))
        return et
