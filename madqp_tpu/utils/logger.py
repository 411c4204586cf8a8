"""Leveled logger with optional file sink and the iteration table.

Equivalent of MadNLPLogger (reference src/utils.jl:130-134) and the
iteration log line `MadNLP.print_iter` (src/structure.jl:178-195): same
9-column format, header reprinted every 10 iterations.
"""

from __future__ import annotations

import math
import sys
from typing import Optional, TextIO

TRACE = 5
DEBUG = 10
INFO = 20
NOTICE = 25
WARN = 30
ERROR = 40


class MadLogger:
    def __init__(
        self,
        print_level: int = INFO,
        file_print_level: int = INFO,
        output_file: str = "",
        stream: Optional[TextIO] = None,
    ):
        self.print_level = print_level
        self.file_print_level = file_print_level
        self.stream = stream if stream is not None else sys.stdout
        self.file: Optional[TextIO] = open(output_file, "w") if output_file else None

    def log(self, level: int, msg: str) -> None:
        if level >= self.print_level:
            print(msg, file=self.stream)
        if self.file is not None and level >= self.file_print_level:
            print(msg, file=self.file)

    def trace(self, msg: str) -> None:
        self.log(TRACE, msg)

    def debug(self, msg: str) -> None:
        self.log(DEBUG, msg)

    def info(self, msg: str) -> None:
        self.log(INFO, msg)

    def notice(self, msg: str) -> None:
        self.log(NOTICE, msg)

    def error(self, msg: str) -> None:
        self.log(ERROR, msg)

    def close(self) -> None:
        if self.file is not None:
            self.file.close()
            self.file = None

    # -- iteration table ---------------------------------------------------

    HEADER = "iter    objective    inf_pr   inf_du lg(mu)  ||d||  lg(rg) alpha_du alpha_pr"

    def print_iter(
        self,
        k: int,
        obj_val: float,
        inf_pr: float,
        inf_du: float,
        mu: float,
        d_norm: float,
        del_w: float,
        alpha_d: float,
        alpha_p: float,
    ) -> None:
        """Reference 9-column line (src/structure.jl:180-193)."""
        if k % 10 == 0:
            self.log(INFO, self.HEADER)
        lg_mu = math.log10(mu) if mu > 0 else -math.inf
        rg = "   - " if del_w == 0 else f"{math.log10(del_w):5.1f}"
        self.log(
            INFO,
            f"{k:4d}  {obj_val: 10.7e} {inf_pr:6.2e} {inf_du:6.2e} "
            f"{lg_mu:5.1f} {d_norm:6.2e} {rg} {alpha_d:6.2e} {alpha_p:6.2e}",
        )

    def print_ignored_options(self, ignored: dict) -> None:
        for k in ignored:
            self.log(WARN, f"Option {k} is not supported; ignoring it.")

    def print_summary(
        self,
        iter: int,
        objective: float,
        objective_scaled: float,
        inf_pr: float,
        inf_du: float,
        inf_compl: float,
        total_time: float,
        init_time: float,
        linear_solver_time: float,
        factorizations: int,
        backsolves: int,
    ) -> None:
        """Final summary block (reference MadNLP.print_summary, called at
        src/solver.jl:394 for non-error exits)."""
        ls = (f"{linear_solver_time:18.6f}" if linear_solver_time >= 0
              else "      not measured")
        self.log(NOTICE, (
            f"\nNumber of Iterations....: {iter}\n"
            "\n"
            "                                   (scaled)                 (unscaled)\n"
            f"Objective...............:  {objective_scaled: .16e}   {objective: .16e}\n"
            f"Dual infeasibility......:  {inf_du: .16e}\n"
            f"Constraint violation....:  {inf_pr: .16e}\n"
            f"Complementarity.........:  {inf_compl: .16e}\n"
            "\n"
            f"Number of KKT factorizations                 = {factorizations}\n"
            f"Number of KKT backsolves                     = {backsolves}\n"
            f"Total seconds in initialization              = {init_time:18.6f}\n"
            f"Total seconds in solver                      = {total_time:18.6f}\n"
            f"Total seconds in linear solver               = {ls}\n"
        ))
