"""Config system: INI files with ``${:var}`` interpolation + dataclass opts.

Mirrors the reference's three cooperating config layers
(satools/script_utils.py:244-301 ``vartoml``, script_utils.py:441-494
``ConfigParser`` dataclass mixin, and per-trainer dataclass opts with
``load_from_args`` auto-argparse) — reimplemented from scratch.

INI semantics:
- a ``[var]`` section defines variables,
- ``${:name}`` anywhere is replaced by the variable value, with the process
  environment taking precedence over the ``[var]`` section (enables
  ``vq=128 python train.py ...`` style overrides),
- inline ``  # comment`` suffixes are stripped.
"""
from __future__ import annotations

import argparse
import atexit
import configparser
import dataclasses
import json
import os
import re
import sys
import threading
from typing import Any, Dict, Type, TypeVar, Optional

_RE_VAR = re.compile(r"[$][{][:]([a-zA-Z0-9_-]+)[}]")
_RE_INLINE_COMMENT = re.compile(r"\s+#")


def _strip_inline_comment(value: str) -> str:
    m = _RE_INLINE_COMMENT.search(value)
    return value[: m.start()].strip() if m else value


def load_ini(path: str) -> Dict[str, Dict[str, str]]:
    """Parse an INI config with ``${:var}`` interpolation and env override."""
    cp = configparser.ConfigParser(interpolation=None)
    cp.optionxform = str  # keep case
    with open(path) as f:
        cp.read_string(f.read())
    raw = {sec: dict(cp.items(sec)) for sec in cp.sections()}
    variables = dict(raw.get("var", {}))

    def substitute(value: str) -> str:
        def repl(m: re.Match) -> str:
            name = m.group(1)
            if name in os.environ:
                return os.environ[name]
            if name not in variables:
                raise KeyError(
                    f"config variable '{name}' not defined in [var] section nor environment"
                )
            return variables[name]

        # vars may reference other vars (e.g. exp = exp/run_vq${:vq}):
        # substitute to a fixed point, bounded against reference cycles
        for _ in range(10):
            if not _RE_VAR.search(value):
                return value
            new = _RE_VAR.sub(repl, value)
            if new == value:
                raise ValueError(
                    f"unresolvable config variable reference in {value!r}")
            value = new
        raise ValueError(
            f"config variable nesting too deep (cycle?) in {value!r}")

    out: Dict[str, Dict[str, str]] = {}
    for sec, kv in raw.items():
        out[sec] = {}
        for k, v in kv.items():
            v = _strip_inline_comment(v)
            out[sec][k] = substitute(v) if _RE_VAR.search(v) else v
    return out


def str2bool(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("yes", "true", "t", "y", "1"):
        return True
    if s in ("no", "false", "f", "n", "0", ""):
        return False
    raise ValueError(f"cannot interpret {v!r} as bool")


T = TypeVar("T", bound="Opts")


@dataclasses.dataclass
class Opts:
    """Base for trainer option dataclasses.

    Provides ``load_from_config`` (type-coerced assignment from a string dict)
    and ``load_from_args`` (auto-generated argparse: field ``a_b`` becomes
    ``--a-b``), matching the reference trainer convention.
    """

    _TYPE_NAMES = {"int": int, "float": float, "str": str, "bool": bool}

    def load_from_config(self: T, cfg: Dict[str, Any]) -> T:
        hints = {}
        for klass in reversed(type(self).__mro__):
            hints.update(getattr(klass, "__annotations__", {}))
        for key, value in cfg.items():
            if not hasattr(self, key):
                continue
            ftype = hints.get(key, str)
            if isinstance(ftype, str):  # `from __future__ import annotations`
                ftype = self._TYPE_NAMES.get(ftype, str)
            if ftype is bool:
                setattr(self, key, str2bool(value))
            elif ftype in (dict,):
                setattr(self, key, value)
            else:
                caster = ftype if callable(ftype) else str
                setattr(self, key, caster(value))
        return self

    def load_from_args(self: T, argv=None) -> T:
        parser = argparse.ArgumentParser(description=type(self).__name__)
        for field in dataclasses.fields(self):
            name = "--" + field.name.replace("_", "-")
            default = getattr(self, field.name)
            ftype = field.type
            if isinstance(ftype, str):
                ftype = self._TYPE_NAMES.get(ftype, type(default))
            if ftype is bool or isinstance(default, bool):
                parser.add_argument(name, type=str2bool, default=default)
            else:
                if not callable(ftype):
                    ftype = type(default)
                if ftype in (dict, list):
                    parser.add_argument(name, type=json.loads, default=default)
                else:
                    parser.add_argument(name, type=ftype, default=default)
        args, _ = parser.parse_known_args(argv if argv is not None else sys.argv[1:])
        for field in dataclasses.fields(self):
            setattr(self, field.name, getattr(args, field.name))
        return self

    def get_forcmd(self, key: str):
        if getattr(self, key) == "":
            return []
        return [f"--{key.replace('_', '-')}", str(getattr(self, key)).replace("\n", "")]

    def asdict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def read_single_param_file(src: str, typename: Type = int):
    with open(src) as f:
        return typename(f.readline().strip())


def write_single_param_file(value: Any, filename: str) -> None:
    with open(filename, "w") as f:
        f.write(f"{value}")


def split_dict(d: Dict, n: int):
    """Split a dict into n contiguous shards (reference script_utils.py:500-507)."""
    keys = list(d.keys())
    k, m = divmod(len(keys), n)
    return [
        {key: d[key] for key in keys[i * k + min(i, m) : (i + 1) * k + min(i + 1, m)]}
        for i in range(n)
    ]


_NOISE_PATTERNS = (b"cpu_aot_loader.cc",)
_noise_filter_installed = False


def install_stderr_noise_filter() -> None:
    """Drop known-noise XLA C++ log lines from fd 2.

    The XLA:CPU AOT loader logs a multi-KB machine-feature dump at ERROR
    severity on EVERY persistent-cache reload, even valid same-config ones
    (the +prefer-no-gather/scatter "features" are compile-time tuning
    pseudo-features the host probe never reports — reloads still succeed).
    Driver artifacts capture stderr tails, and the spam buries real errors
    (the BENCH_r04 tail was ~95% this). The lines are written by C++ and
    bypass sys.stderr, so filtering means fd surgery: dup fd 2 to a pipe
    drained by a daemon thread that forwards everything except the known
    patterns to the real stderr. An atexit hook restores fd 2 (EOF-ing the
    pipe so the drainer flushes any tail) before interpreter teardown.

    No-op under pytest (it owns fd 2 for capture) and with
    SATPU_NO_STDERR_FILTER=1.
    """
    global _noise_filter_installed
    if (_noise_filter_installed or os.environ.get("SATPU_NO_STDERR_FILTER")
            or "PYTEST_CURRENT_TEST" in os.environ or "pytest" in sys.modules):
        return
    _noise_filter_installed = True
    orig = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def drain():
        buf = b""
        while True:
            try:
                chunk = os.read(r, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            lines = buf.split(b"\n")
            buf = lines.pop()
            for ln in lines:
                if not any(p in ln for p in _NOISE_PATTERNS):
                    os.write(orig, ln + b"\n")
        if buf and not any(p in buf for p in _NOISE_PATTERNS):
            os.write(orig, buf)
        os.close(r)

    t = threading.Thread(target=drain, daemon=True, name="satpu-stderr-filter")
    t.start()

    def _restore():
        try:
            sys.stderr.flush()
        except Exception:
            pass
        os.dup2(orig, 2)  # closes the pipe write end -> drainer sees EOF
        t.join(timeout=5.0)

    atexit.register(_restore)


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Configure the JAX runtime for a CLI entry point: virtual-mesh XLA
    flag pins (satpu.parallel.hostmesh) + a persistent host-local
    compilation cache. Call before the first JAX computation.

    The serving/eval CLIs compile one program per padded bucket; without a
    persistent cache every invocation pays the full set again (~5 min for
    the 9 default buckets at full model scale on a tunneled v5e — the actual
    device compute for a 30-minute corpus is ~2 s). Host-local (not in-repo):
    AOT artifacts are machine/libtpu-specific.

    The cache root is namespaced by a (jaxlib version, XLA_FLAGS,
    JAX_PLATFORMS) fingerprint: XLA:CPU AOT executables embed codegen
    details the jax cache key does not cover, so differently-flagged
    processes (pytest parent with the axon plugin vs JAX_PLATFORMS=cpu mesh
    subprocesses) must not share entries (round-3 verdict #3). Same-config
    processes keep full reuse — measured: dryrun GAN compile 28.6 s cold ->
    6.3 s warm. Note the loader's machine-feature-mismatch log spam
    (+prefer-no-gather/scatter) appears even on a valid same-config reload
    (those are compile-time tuning pseudo-features the host-feature probe
    never reports); it is noise, not a rejection — reloads still succeed.
    """
    import hashlib

    import jax
    import jaxlib

    from ..parallel.hostmesh import ensure_cpu_mesh_flags

    ensure_cpu_mesh_flags()  # must precede the fingerprint + backend init
    install_stderr_noise_filter()  # driver tails must surface real errors
    path = path or os.environ.get(
        "SATPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "satpu_jax"))
    fp = hashlib.sha1(":".join([
        jaxlib.__version__,
        os.environ.get("XLA_FLAGS", ""),
        os.environ.get("JAX_PLATFORMS", ""),
    ]).encode()).hexdigest()[:10]
    path = os.path.join(path, fp)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
