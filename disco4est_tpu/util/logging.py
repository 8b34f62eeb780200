"""Per-category logging with console + per-category file routing.

Role of the reference's zlog setup (`IO/logging.conf:20-31`): every
subsystem logs under its own category (d4est, d4est_geometry, d4est_amr,
d4est_solver_*, d4est_norms, …); messages go to the console, to a
combined `run.log`, and to `<category>.log` files.

Usage:
    from disco4est_tpu.util.logging import init_logging, get_category
    init_logging(log_dir="logs")        # or None: console only
    log = get_category("d4est_solver_cg")
    log.info("iter %d r2 %.3e", it, r2)
"""

from __future__ import annotations

import logging
import os

_PREFIX = "disco4est"
_CONFIGURED = False
_LOG_DIR: str | None = None

#: the reference's category set (`IO/logging.conf`), extended freely —
#: unknown categories are created on demand.
CATEGORIES = (
    "d4est",
    "d4est_geometry",
    "d4est_mesh",
    "d4est_amr",
    "d4est_quadrature",
    "d4est_solver_cg",
    "d4est_solver_fcg",
    "d4est_solver_newton",
    "d4est_solver_multigrid",
    "d4est_solver_schwarz",
    "d4est_norms",
    "problem",
)

_FMT = logging.Formatter(
    "%(asctime)s [%(name)s:%(levelname)s] %(message)s", "%H:%M:%S"
)


def init_logging(log_dir: str | None = None, level=logging.INFO,
                 console: bool = True):
    """Configure the category tree (idempotent; reconfigures on a new
    log_dir).  With `log_dir`, messages also land in `run.log` plus one
    `<category>.log` per category — the zlog routing contract."""
    global _CONFIGURED, _LOG_DIR
    root = logging.getLogger(_PREFIX)
    root.setLevel(level)
    root.propagate = False
    for h in list(root.handlers):
        root.removeHandler(h)
    if console:
        ch = logging.StreamHandler()
        ch.setFormatter(_FMT)
        root.addHandler(ch)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "run.log"))
        fh.setFormatter(_FMT)
        root.addHandler(fh)
    _LOG_DIR = log_dir
    _CONFIGURED = True
    for c in CATEGORIES:
        get_category(c)
    return root


def get_category(name: str) -> logging.Logger:
    """Logger for a category; attaches the per-category file handler
    lazily (`zlog_get_category` role)."""
    if not _CONFIGURED:
        init_logging(None)
    log = logging.getLogger(f"{_PREFIX}.{name}")
    if _LOG_DIR is not None and not any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "_d4est_cat", None) == name
        for h in log.handlers
    ):
        fh = logging.FileHandler(os.path.join(_LOG_DIR, f"{name}.log"))
        fh.setFormatter(_FMT)
        fh._d4est_cat = name
        log.addHandler(fh)
    return log
