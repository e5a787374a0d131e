"""Command-line experiment runner.

Preserves the reference's Sacred command surface
(``python entry/<model>.py <command> with k=v ... [-u]``, README.md:93)
with a small self-contained implementation:

- commands: ``train`` / ``test`` / ``visualize`` (per entry) plus built-in
  ``print_config`` and ``help``;
- ``with a.b=v`` dotted overrides;
- ``-u`` / ``--unobserved`` disables run recording (reference: Sacred
  FileStorage observer, utils/misc.py:34-45);
- observed runs get an auto-incrementing integer run id under
  ``<g.model_dir>/<tag>/<id>/`` with the config snapshot saved as JSON.
"""

from __future__ import annotations

import copy
import json
import sys
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

from pemp_tpu.config.base import apply_overrides, flatten_config, format_config


class Run:
    """A single experiment run: id, directory, scalar metric log.

    Mirrors the slice of ``sacred.run.Run`` the reference uses
    (``_run._id``, ``run.log_scalar``, core/base_trainer.py:303-308).
    """

    def __init__(self, run_id: Optional[int], run_dir: Optional[Path]):
        self._id = run_id
        self.run_dir = run_dir
        self._scalars: Dict[str, List] = {}
        self.observers: List = []   # e.g. observers.MongoRunObserver
        if run_dir is not None and (run_dir / "metrics.json").exists():
            # resumed runs reuse the dir: preload the history so the
            # first post-resume log_scalar doesn't wipe metrics.json
            try:
                with open(run_dir / "metrics.json") as f:
                    self._scalars = json.load(f)
            except Exception:
                pass

    def log_scalar(self, name: str, value: float, step: int) -> None:
        self._scalars.setdefault(name, []).append([step, float(value)])
        if self.run_dir is not None:
            with open(self.run_dir / "metrics.json", "w") as f:
                json.dump(self._scalars, f)
        for obs in self.observers:
            obs.log_scalar(name, value, step)

    def finish(self, status: str = "COMPLETED", result=None) -> None:
        for obs in self.observers:
            obs.finish(status, result)


def _next_run_id(tag_dir: Path) -> int:
    existing = [int(p.name) for p in tag_dir.glob("*") if p.name.isdigit()]
    return max(existing, default=0) + 1


class Experiment:
    """Experiment = named command registry + config assembly + run dirs."""

    def __init__(self, name: str, config):
        self.name = name
        self.base_config = config
        self.commands: Dict[str, Callable] = {}
        self.command("print_config")(self._print_config)

    def command(self, name: Optional[str] = None):
        def wrap(fn: Callable) -> Callable:
            self.commands[name or fn.__name__] = fn
            return fn
        if callable(name):
            fn, name = name, name.__name__
            return wrap(fn)
        return wrap

    # `ex.main` style alias so entries read naturally
    main = command

    def _print_config(self, cfg, run):
        print(format_config(cfg))

    def assemble(self, command: str, overrides: Dict[str, Any],
                 observed: bool = True):
        cfg = apply_overrides(copy.deepcopy(self.base_config), overrides)
        # Config hook: require an explicit split for train/test
        # (reference: utils/misc.py:48-53).
        if command in ("train", "test") and cfg.split not in (0, 1, 2, 3):
            raise ValueError(
                f"'split' must be specified in [0, 1, 2, 3], got {cfg.split}")

        if command == "train" and cfg.resume and cfg.exp_id < 0:
            # without this, a fresh run dir is allocated, no checkpoint
            # is found there, and training silently restarts from
            # scratch despite the user's explicit resume intent
            raise ValueError(
                "resume=True requires exp_id=<run id of the run to "
                f"resume> (got exp_id={cfg.exp_id})")

        # Rank-0-only recording must hold for DIRECT assemble() callers
        # too (library use, test workers) — not just run_commandline:
        # otherwise every rank races mkdir for the same run id, and
        # whichever NON-recording rank wins leaves a run dir with no
        # ckpt.msgpack, so a later resume=True exp_id=N silently
        # restarts from scratch (caught live by
        # tests/test_distributed_2proc.py::test_two_process_resume).
        if observed and command in ("train", "test"):
            import jax
            if jax.distributed.is_initialized() and jax.process_index() != 0:
                observed = False
        run_id, run_dir = None, None
        if observed and command in ("train", "test") and cfg.g.fileStorage:
            tag_dir = Path(cfg.g.model_dir) / str(cfg.tag)
            tag_dir.mkdir(parents=True, exist_ok=True)
            resuming = (command == "train" and cfg.resume
                        and cfg.exp_id >= 0)
            if resuming:
                # resume REUSES the original run dir — a fresh id would
                # never see that run's ckpt.msgpack
                run_id = cfg.exp_id
                run_dir = tag_dir / str(run_id)
                run_dir.mkdir(parents=True, exist_ok=True)
                # preserve the original provenance (config.json, sources,
                # REVISION record what produced the earlier epochs);
                # record the resume invocation separately
                with open(run_dir / "config.resume.json", "w") as f:
                    json.dump({k: repr(v) for k, v
                               in flatten_config(cfg).items()}, f, indent=2)
            else:
                # atomic id allocation: mkdir(exist_ok=False) + retry,
                # or concurrent runs on one tag would share a dir and
                # clobber each other's checkpoints
                while True:
                    run_id = _next_run_id(tag_dir)
                    run_dir = tag_dir / str(run_id)
                    try:
                        run_dir.mkdir(parents=True, exist_ok=False)
                        break
                    except FileExistsError:
                        continue
                with open(run_dir / "config.json", "w") as f:
                    json.dump({k: repr(v) for k, v
                               in flatten_config(cfg).items()}, f, indent=2)
                self._snapshot_sources(run_dir)
        run = Run(run_id, run_dir)
        if command in ("train", "test"):
            from pemp_tpu.utils.observers import maybe_attach
            maybe_attach(run, cfg, self.name, command)
        return cfg, run

    def _snapshot_sources(self, run_dir: Path) -> None:
        """Copy the entry script + git revision into the run dir
        (reference: utils/misc.py:23-31 source snapshots)."""
        import shutil
        import subprocess
        try:
            entry = Path(sys.argv[0])
            if entry.exists() and entry.suffix == ".py":
                src_dir = run_dir / "sources"
                src_dir.mkdir(exist_ok=True)
                shutil.copy2(entry, src_dir / entry.name)
            rev = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True,
                text=True, timeout=5)
            if rev.returncode == 0:
                (run_dir / "REVISION").write_text(rev.stdout)
        except Exception:
            pass    # snapshots are best-effort

    def run_commandline(self, argv: Optional[List[str]] = None):
        argv = list(sys.argv[1:] if argv is None else argv)
        if not argv or argv[0] in ("help", "-h", "--help"):
            print(f"usage: {self.name} <command> [with k=v ...] [-u]")
            print("commands:", ", ".join(sorted(self.commands)))
            return None

        command = argv[0]
        rest = argv[1:]
        observed = True
        print_cfg = False
        overrides: Dict[str, Any] = {}
        expect_with = True
        for token in rest:
            if token in ("-u", "--unobserved"):
                observed = False
            elif token in ("-p", "--print-config"):
                # Sacred grammar (reference README usage): print the
                # assembled config, then run the command normally
                print_cfg = True
            elif token == "with" and expect_with:
                expect_with = False
            elif "=" in token:
                key, _, value = token.partition("=")
                overrides[key] = value
            else:
                raise SystemExit(f"Unrecognized argument: {token}")

        if command not in self.commands:
            raise SystemExit(
                f"Unknown command '{command}'. "
                f"Available: {', '.join(sorted(self.commands))}")

        # Multi-host: initialize jax.distributed BEFORE any jax op (and
        # before run-dir creation — assemble() gates recording to rank 0).
        from pemp_tpu.parallel.mesh import initialize_distributed
        initialize_distributed()

        cfg, run = self.assemble(command, overrides, observed=observed)
        if print_cfg and command != "print_config":
            print(format_config(cfg))
        try:
            result = self.commands[command](cfg, run)
        except KeyboardInterrupt:
            run.finish("INTERRUPTED")
            raise
        except Exception:
            run.finish("FAILED")
            raise
        # a preempted training run is not COMPLETED: record it with the
        # same status Sacred uses for ctrl-C so run records distinguish
        # resumable runs from finished ones
        run.finish("INTERRUPTED" if result == "PREEMPTED" else "COMPLETED",
                   result)
        return result
