"""ctypes binding to the system liblmdb C library (lmdb-package API subset).

The ``lmdb`` Python wheel is a C extension that cannot be installed in
this container, but the liblmdb SHARED LIBRARY itself is often present
(conda/apt ship it). This module drives the real library through ctypes
with the same API slice the export sink uses (``open`` /
``Environment.begin`` / ``Transaction.put``/``get``/``commit`` /
``Environment.close``), so stores are written and read by genuine
liblmdb code — the strongest possible execution of the real-LMDB path.
``sources/pylmdb.py`` (the pure-Python re-implementation of the same
file format) remains the fallback when no shared library exists, and
the two are cross-validated against each other in
tests/test_round5_additions.py.

C signatures from the public lmdb.h (OpenLDAP liblmdb 0.9.x).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import glob as _glob
import os
import sys

# -- public lmdb.h constants -------------------------------------------------
MDB_RDONLY = 0x20000
MDB_NOSUBDIR = 0x4000
MDB_NOLOCK = 0x400000
MDB_NOTFOUND = -30798


class _MDBVal(ctypes.Structure):
    _fields_ = [("mv_size", ctypes.c_size_t), ("mv_data", ctypes.c_void_p)]


def _find_liblmdb() -> str | None:
    name = ctypes.util.find_library("lmdb")
    if name:
        return name
    candidates: list[str] = []
    prefixes = [
        sys.prefix,
        os.environ.get("CONDA_PREFIX", ""),
        "/usr",
        "/usr/local",
        os.path.expanduser("~/miniconda"),
        os.path.expanduser("~/anaconda3"),
    ]
    for p in filter(None, prefixes):
        candidates += _glob.glob(os.path.join(p, "lib", "liblmdb.so*"))
        candidates += _glob.glob(os.path.join(p, "lib", "*", "liblmdb.so*"))
    return candidates[0] if candidates else None


_LIB: ctypes.CDLL | None = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        path = _find_liblmdb()
        if path is None:
            raise ImportError("no liblmdb shared library found")
        lib = ctypes.CDLL(path)
        lib.mdb_strerror.restype = ctypes.c_char_p
        lib.mdb_strerror.argtypes = [ctypes.c_int]
        lib.mdb_env_create.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
        lib.mdb_env_set_mapsize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.mdb_env_open.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint, ctypes.c_int,
        ]
        lib.mdb_env_close.argtypes = [ctypes.c_void_p]
        lib.mdb_txn_begin.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.mdb_txn_commit.argtypes = [ctypes.c_void_p]
        lib.mdb_txn_abort.argtypes = [ctypes.c_void_p]
        lib.mdb_dbi_open.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint,
            ctypes.POINTER(ctypes.c_uint),
        ]
        lib.mdb_put.argtypes = [
            ctypes.c_void_p, ctypes.c_uint,
            ctypes.POINTER(_MDBVal), ctypes.POINTER(_MDBVal), ctypes.c_uint,
        ]
        lib.mdb_get.argtypes = [
            ctypes.c_void_p, ctypes.c_uint,
            ctypes.POINTER(_MDBVal), ctypes.POINTER(_MDBVal),
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:  # noqa: BLE001 - unloadable/incomplete .so == unavailable
        # Not just ImportError: a wrong-arch or truncated liblmdb.so
        # found by the glob raises OSError from CDLL, an ancient one
        # AttributeError on missing symbols. Any failure means this
        # tier is unavailable — callers fall through to pylmdb.
        return False


def _check(rc: int, what: str) -> None:
    if rc != 0:
        raise EnvironmentError(f"{what}: {_lib().mdb_strerror(rc).decode()} ({rc})")


def _val(data: bytes) -> _MDBVal:
    buf = ctypes.create_string_buffer(data, len(data))
    val = _MDBVal(len(data), ctypes.cast(buf, ctypes.c_void_p))
    val._keepalive = buf  # the struct holds a raw pointer; pin the buffer
    return val


class Transaction:
    def __init__(self, env: "Environment", write: bool) -> None:
        self._env = env
        self._write = write
        self._txn = ctypes.c_void_p()
        flags = 0 if write else MDB_RDONLY
        _check(
            _lib().mdb_txn_begin(env._env, None, flags, ctypes.byref(self._txn)),
            "mdb_txn_begin",
        )
        self._done = False
        self._dbi = ctypes.c_uint()
        try:
            _check(
                _lib().mdb_dbi_open(self._txn, None, 0, ctypes.byref(self._dbi)),
                "mdb_dbi_open",
            )
        except BaseException:
            # never leak a live txn into env.close() (liblmdb UB)
            self.abort()
            raise
        env._live_txns.add(self)

    def __enter__(self) -> "Transaction":
        return self

    def __exit__(self, exc_type, *_exc) -> None:
        if self._done:
            return
        if exc_type is None:
            self.commit()
        else:
            self.abort()

    def put(self, key: bytes, value: bytes) -> bool:
        k, v = _val(bytes(key)), _val(bytes(value))
        _check(_lib().mdb_put(self._txn, self._dbi, ctypes.byref(k), ctypes.byref(v), 0), "mdb_put")
        return True

    def get(self, key: bytes, default: bytes | None = None) -> bytes | None:
        k, v = _val(bytes(key)), _MDBVal()
        rc = _lib().mdb_get(self._txn, self._dbi, ctypes.byref(k), ctypes.byref(v))
        if rc == MDB_NOTFOUND:
            return default
        _check(rc, "mdb_get")
        return ctypes.string_at(v.mv_data, v.mv_size)

    def commit(self) -> None:
        if not self._done:
            # mdb_txn_commit frees the handle whether or not it succeeds
            # — mark done BEFORE raising so a later abort can't double-free
            self._done = True
            self._env._live_txns.discard(self)
            _check(_lib().mdb_txn_commit(self._txn), "mdb_txn_commit")

    def abort(self) -> None:
        if not self._done:
            _lib().mdb_txn_abort(self._txn)
            self._done = True
            self._env._live_txns.discard(self)


class Environment:
    def __init__(self, path: str, map_size: int, readonly: bool, lock: bool, subdir: bool) -> None:
        self.readonly = readonly
        if subdir:
            os.makedirs(path, exist_ok=True)
        self._env = ctypes.c_void_p()
        _check(_lib().mdb_env_create(ctypes.byref(self._env)), "mdb_env_create")
        _check(_lib().mdb_env_set_mapsize(self._env, map_size), "mdb_env_set_mapsize")
        flags = 0
        if readonly:
            flags |= MDB_RDONLY
        if not lock:
            flags |= MDB_NOLOCK
        if not subdir:
            flags |= MDB_NOSUBDIR
        rc = _lib().mdb_env_open(self._env, path.encode(), flags, 0o644)
        if rc != 0:
            _lib().mdb_env_close(self._env)
            self._env = None
            _check(rc, "mdb_env_open")
        self._closed = False
        # live Transaction handles; closing an env with an unfinished txn
        # is undefined behavior in liblmdb, so close() aborts these first
        self._live_txns: set[Transaction] = set()

    def begin(self, write: bool = False, **_kw) -> Transaction:
        if self._closed:
            raise EnvironmentError("environment closed")
        if write and self.readonly:
            raise EnvironmentError("read-only environment")
        return Transaction(self, write)

    def close(self) -> None:
        if not self._closed and self._env:
            for txn in list(self._live_txns):
                txn.abort()
            _lib().mdb_env_close(self._env)
            self._closed = True


def open(  # noqa: A001 - mirrors the lmdb package's module-level API
    path: str,
    map_size: int = 10 * 1024 * 1024,
    readonly: bool = False,
    lock: bool = True,
    subdir: bool = True,
    **_kw,
) -> Environment:
    return Environment(path, map_size, readonly, lock, subdir)
