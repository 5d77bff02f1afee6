"""Instrumented end-to-end demo run for the persistent-compile-cache
diagnosis (VERDICT round-1 next-round #7): wraps JAX's compilation-cache
get/put, its (de)compression, and the backend compile+load with wall-clock
logging, then runs the CLI unmodified.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python bench/cache_probe.py \
        --config_file configs/sokrates.json --compile-cache /tmp/psgsdf_xla_cache

Emits `[cache-probe]` lines to stderr:
    COMPILE <module> <secs>                    every backend compile+load
    GET HIT|MISS <key> <secs>                  every cache lookup
    PUT <module> total=<s> compress=<s> bytes= every cache write
      (put total - compress ~= executable.serialize(), the serialized-blob
       fetch RPC on remote backends)
Findings are written up in BASELINE.md ("Compile tax & persistent cache").
"""

import sys
import time

import jax._src.compilation_cache as cc
from jax._src import compiler as _compiler


def _log(msg):
    print(f"[cache-probe] {msg}", file=sys.stderr, flush=True)


_real_get = cc.get_executable_and_time
_real_put = cc.put_executable_and_time
_real_compress = cc.compress_executable
_real_decompress = cc.decompress_executable
_real_compile = _compiler.backend_compile_and_load

_last = {"compress": 0.0, "bytes": -1, "decompress": 0.0}


def compress_executable(data):
    t0 = time.perf_counter()
    out = _real_compress(data)
    _last["compress"] = time.perf_counter() - t0
    _last["bytes"] = len(out)
    return out


def decompress_executable(data):
    t0 = time.perf_counter()
    out = _real_decompress(data)
    _last["decompress"] = time.perf_counter() - t0
    return out


def get_executable_and_time(cache_key, compile_options, backend,
                            executable_devices):
    t0 = time.perf_counter()
    _last["decompress"] = 0.0
    ex, t = _real_get(cache_key, compile_options, backend, executable_devices)
    dt = time.perf_counter() - t0
    _log(f"GET {'HIT ' if ex is not None else 'MISS'} key={cache_key[:16]} "
         f"total={dt:.3f}s decompress={_last['decompress']:.3f}s "
         f"(total-decompress ~= deserialize RPC on hits)")
    return ex, t


def put_executable_and_time(cache_key, module_name, executable, backend,
                            compile_time):
    t0 = time.perf_counter()
    _last["compress"], _last["bytes"] = 0.0, -1
    r = _real_put(cache_key, module_name, executable, backend, compile_time)
    dt = time.perf_counter() - t0
    _log(f"PUT {module_name} key={cache_key[:16]} total={dt:.3f}s "
         f"compress={_last['compress']:.3f}s bytes={_last['bytes']} "
         f"(total-compress ~= executable.serialize() RPC)")
    return r


def backend_compile_and_load(backend, module, executable_devices, options,
                             *a, **kw):
    try:
        name = module.operation.attributes["sym_name"].value
    except Exception:
        name = "<module>"
    t0 = time.perf_counter()
    out = _real_compile(backend, module, executable_devices, options, *a, **kw)
    _log(f"COMPILE {name} {time.perf_counter() - t0:.3f}s")
    return out


cc.get_executable_and_time = get_executable_and_time
cc.put_executable_and_time = put_executable_and_time
cc.compress_executable = compress_executable
cc.decompress_executable = decompress_executable
_compiler.backend_compile_and_load = backend_compile_and_load


if __name__ == "__main__":
    from psgradientsdf_tpu.cli import main

    t0 = time.perf_counter()
    rc = main()
    _log(f"TOTAL wall {time.perf_counter() - t0:.1f}s rc={rc}")
    sys.exit(rc or 0)
