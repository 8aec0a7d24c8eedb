"""TSV thermo reporter matching the reference's StateDataReporter log format.

The reference logs tab-separated columns '#"Step" "Time (ps)"
"Kinetic Energy (kJ/mole)" "Temperature (K)"' every report interval
(reference: /root/reference/code/LJ/test_script/test_langevin.py:79-83), and
the analysis notebooks parse those files — so the format survives here.
"""

import numpy as np


class StateReporter:
    """Write per-step thermo arrays to a StateDataReporter-compatible TSV."""

    def __init__(self, path, report_interval=100, dt_fs=2.0,
                 potential_energy=False):
        self.path = path
        self.report_interval = report_interval
        self.dt_fs = dt_fs
        self.potential_energy = potential_energy

    def write(self, thermo, start_step=0, potential=None):
        """Args:
            thermo: md.simulate.Thermo with per-step arrays.
            start_step: step offset for resumed runs.
            potential: optional [steps] PE array (classical runs).
        """
        ke = np.asarray(thermo.kinetic_energy)
        temp = np.asarray(thermo.temperature)
        cols = ['#"Step"', '"Time (ps)"']
        if self.potential_energy:
            cols.append('"Potential Energy (kJ/mole)"')
        cols += ['"Kinetic Energy (kJ/mole)"', '"Temperature (K)"']
        lines = ["\t".join(cols)]
        for i in range(self.report_interval - 1, ke.shape[0],
                       self.report_interval):
            step = start_step + i + 1
            row = [str(step), f"{step * self.dt_fs * 1e-3:.6f}"]
            if self.potential_energy:
                row.append(f"{float(potential[i]):.6f}")
            row += [f"{float(ke[i]):.6f}", f"{float(temp[i]):.6f}"]
            lines.append("\t".join(row))
        with open(self.path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return len(lines) - 1
