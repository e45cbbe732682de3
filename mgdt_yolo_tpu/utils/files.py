"""File/path utilities (reference yolo/utils/files.py:1-100).

`increment_path` lives in utils/__init__.py (re-exported here); this module
carries the rest of the reference surface: context-managed cwd switching,
path sanitation, file metadata helpers and latest-run discovery (the
reference's resume default, trainer.py check_resume)."""
from __future__ import annotations

import contextlib
import glob
import os
import shutil
from datetime import datetime
from pathlib import Path

from . import increment_path  # noqa: F401  (re-export, reference parity)


class WorkingDirectory(contextlib.ContextDecorator):
    """Usable as @WorkingDirectory(dir) or 'with WorkingDirectory(dir):'."""

    def __init__(self, new_dir):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __enter__(self):
        os.chdir(self.dir)

    def __exit__(self, exc_type, exc_val, exc_tb):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path):
    """Yield a space-free copy of `path` (underscores), copying changes back
    on exit — some subprocess tooling breaks on spaces."""
    if " " not in str(path):
        yield path
        return
    p = Path(path)
    tmp = p.with_name(p.name.replace(" ", "_"))
    if p.is_dir():
        shutil.copytree(p, tmp, dirs_exist_ok=True)
    elif p.is_file():
        shutil.copy2(p, tmp)
    try:
        yield tmp
    finally:
        if tmp.is_dir():
            shutil.copytree(tmp, p, dirs_exist_ok=True)
            shutil.rmtree(tmp)
        elif tmp.is_file():
            shutil.copy2(tmp, p)
            tmp.unlink()


def file_age(path) -> int:
    """Days since last modification."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path) -> str:
    """'YYYY-M-D' of last modification."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path) -> float:
    """Size in MB (files and directories)."""
    p = Path(path)
    mb = 1 << 20
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent 'last*' checkpoint under search_dir (resume default)."""
    last = glob.glob(f"{search_dir}/**/last*.ckpt*", recursive=True) + \
        glob.glob(f"{search_dir}/**/last*.pt", recursive=True) + \
        glob.glob(f"{search_dir}/**/last*.msgpack", recursive=True)
    dirs = glob.glob(f"{search_dir}/**/last*", recursive=True)
    cands = last or [d for d in dirs if Path(d).exists()]
    return max(cands, key=os.path.getmtime) if cands else ""
