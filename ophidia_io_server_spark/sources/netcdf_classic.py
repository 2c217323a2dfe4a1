"""Minimal pure-Python NetCDF *classic* (CDF-1/CDF-2) reader + writer.

The classic file layout is a public Unidata specification (the "NetCDF
Classic Format Spec"): a header — magic ``CDF\\x01``/``CDF\\x02``, numrecs,
dim list, global attributes, variable list (name, dimids, attributes,
nc_type, vsize, begin offset) — followed by fixed-size variable data stored
contiguously, row-major, big-endian.  That simplicity makes a dependency-free
fallback practical: ``NetCDF4Backend`` (sources/netcdf_import.py) uses the
``netCDF4`` library when installed and this module otherwise, so the real
file-import branch (reference ``oph_io_server_nc.c:755-1190``) is exercised
end to end even in containers without the C library stack.

Scope (deliberately): fixed-size (non-record) variables of the numeric
nc_types, enough for cube import/export parity.  Record variables raise.

The writer exists for tests/fixtures and as the `oph_export`-to-file
counterpart; hyperslab reads go through ``np.memmap`` so a task reading a
slab touches only that slab's bytes (same contract as the netCDF4 branch).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_MAGIC1 = b"CDF\x01"
_MAGIC2 = b"CDF\x02"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type → (numpy big-endian dtype, element size)
_TYPES = {
    1: (">i1", 1),  # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}
_REV_TYPES = {np.dtype(np.float64): 6, np.dtype(np.float32): 5,
              np.dtype(np.int32): 4, np.dtype(np.int16): 3, np.dtype(np.int8): 1}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


@dataclass
class ClassicVar:
    name: str
    dim_names: list[str]
    shape: tuple[int, ...]
    nc_type: int
    begin: int


class ClassicReader:
    """Header parse + memmap hyperslab reads for classic NetCDF files."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self._parse(f)

    # -- header ---------------------------------------------------------

    def _i4(self, f) -> int:
        return struct.unpack(">i", f.read(4))[0]

    def _name(self, f) -> str:
        n = self._i4(f)
        s = f.read(n).decode()
        f.read(_pad4(n))
        return s

    def _skip_attrs(self, f) -> None:
        tag = self._i4(f)
        count = self._i4(f)
        if tag == 0 and count == 0:
            return
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute list tag {tag}")
        for _ in range(count):
            self._name(f)
            t = self._i4(f)
            n = self._i4(f)
            size = n * _TYPES[t][1]
            f.read(size + _pad4(size))

    def _parse(self, f) -> None:
        magic = f.read(4)
        if magic == _MAGIC1:
            self._offsz = 4
        elif magic == _MAGIC2:
            self._offsz = 8
        else:
            raise ValueError(f"not a classic NetCDF file: magic {magic!r}")
        self.numrecs = self._i4(f)
        # dimensions
        tag, count = self._i4(f), self._i4(f)
        self.dims: list[tuple[str, int]] = []
        if tag == _NC_DIMENSION:
            for _ in range(count):
                nm = self._name(f)
                self.dims.append((nm, self._i4(f)))
        elif not (tag == 0 and count == 0):
            raise ValueError(f"bad dim list tag {tag}")
        self._skip_attrs(f)  # global attributes
        # variables
        tag, count = self._i4(f), self._i4(f)
        self.vars: dict[str, ClassicVar] = {}
        if tag == _NC_VARIABLE:
            for _ in range(count):
                nm = self._name(f)
                ndims = self._i4(f)
                dimids = [self._i4(f) for _ in range(ndims)]
                self._skip_attrs(f)
                nc_type = self._i4(f)
                self._i4(f)  # vsize (padded; recomputed from shape)
                begin = (self._i4(f) if self._offsz == 4
                         else struct.unpack(">q", f.read(8))[0])
                dn = [self.dims[d][0] for d in dimids]
                shape = tuple(self.dims[d][1] for d in dimids)
                if any(s == 0 for s in shape):
                    raise ValueError(f"record variable {nm!r} unsupported "
                                     "(classic fallback handles fixed-size only)")
                self.vars[nm] = ClassicVar(nm, dn, shape, nc_type, begin)
        elif not (tag == 0 and count == 0):
            raise ValueError(f"bad var list tag {tag}")

    # -- data -----------------------------------------------------------

    def var_dims(self, measure: str) -> list[tuple[str, int]]:
        v = self.vars[measure]
        return list(zip(v.dim_names, v.shape))

    def read(self, measure: str, start: tuple[int, ...],
             count: tuple[int, ...]) -> np.ndarray:
        v = self.vars[measure]
        dt = np.dtype(_TYPES[v.nc_type][0])
        mm = np.memmap(self.path, dtype=dt, mode="r", offset=v.begin,
                       shape=v.shape, order="C")
        sl = tuple(slice(s, s + c) for s, c in zip(start, count))
        return np.asarray(mm[sl], dtype=np.float64)


def write_classic(path: str, dims: list[tuple[str, int]],
                  variables: dict[str, tuple[list[str], np.ndarray]]) -> None:
    """Write a CDF-1 classic file: ``dims`` = ordered (name, size);
    ``variables`` maps name → (dim_names, row-major ndarray)."""
    dim_index = {n: i for i, (n, _) in enumerate(dims)}

    def name_bytes(s: str) -> bytes:
        b = s.encode()
        return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))

    header = bytearray()
    header += _MAGIC1
    header += struct.pack(">i", 0)  # numrecs
    header += struct.pack(">ii", _NC_DIMENSION, len(dims))
    for n, sz in dims:
        header += name_bytes(n) + struct.pack(">i", sz)
    header += struct.pack(">ii", 0, 0)  # no global attrs
    header += struct.pack(">ii", _NC_VARIABLE, len(variables))

    # first pass with placeholder begins to size the header
    def var_block(name: str, dim_names: list[str], arr: np.ndarray, begin: int) -> bytes:
        nc_type = _REV_TYPES[np.dtype(arr.dtype.newbyteorder("="))]
        vsize = arr.size * _TYPES[nc_type][1]
        vsize += _pad4(vsize)
        blk = name_bytes(name)
        blk += struct.pack(">i", len(dim_names))
        for dn in dim_names:
            blk += struct.pack(">i", dim_index[dn])
        blk += struct.pack(">ii", 0, 0)  # no var attrs
        blk += struct.pack(">iii", nc_type, vsize, begin)
        return bytes(blk)

    items = [(n, dn, np.ascontiguousarray(a)) for n, (dn, a) in variables.items()]
    probe = b"".join(var_block(n, dn, a, 0) for n, dn, a in items)
    data_start = len(header) + len(probe)

    begins, off = [], data_start
    for _, _, a in items:
        begins.append(off)
        nc_type = _REV_TYPES[np.dtype(a.dtype.newbyteorder("="))]
        sz = a.size * _TYPES[nc_type][1]
        off += sz + _pad4(sz)

    with open(path, "wb") as f:
        f.write(header)
        for (n, dn, a), b in zip(items, begins):
            f.write(var_block(n, dn, a, b))
        for n, dn, a in items:
            nc_type = _REV_TYPES[np.dtype(a.dtype.newbyteorder("="))]
            raw = a.astype(_TYPES[nc_type][0]).tobytes(order="C")
            f.write(raw + b"\x00" * _pad4(len(raw)))


# ---------------------------------------------------------------------------
# fragment export (the write half of the file surface)
# ---------------------------------------------------------------------------


def export_fragment_nc(df, path: str, var: str = "m") -> int:
    """Export a fragment (id_dim long, measure double[]) to ONE classic
    NetCDF file: dims (id_dim: nrows, array: maxlen), short rows NaN-padded.

    Driver-side collect — the single-file parity surface (the reference's
    export is likewise one server writing one fragment).  For cluster-scale
    exports use ``export_fragment_nc_sharded``: one file per partition,
    written BY the executors, no driver bottleneck."""
    rows = sorted((r[0], list(r[1] or [])) for r in df.select("id_dim", "measure").collect())
    n = len(rows)
    width = max((len(m) for _, m in rows), default=0)
    data = np.full((n, width), np.nan, dtype=np.float64)
    ids = np.empty((n,), dtype=np.int32)
    for i, (rid, m) in enumerate(rows):
        ids[i] = rid
        data[i, : len(m)] = m
    write_classic(
        path,
        dims=[("id_dim", n), ("array", width)],
        variables={var: (["id_dim", "array"], data),
                   "id_dim": (["id_dim"], ids)},
    )
    return n


def export_fragment_nc_sharded(df, out_dir: str, var: str = "m") -> int:
    """Cluster-scale export: range-partition by id_dim and have EACH TASK
    write its own classic file ``part-<pid>.nc`` under ``out_dir`` (shared
    FS), so export bandwidth scales with executors — the Spark-native
    counterpart of Ophidia's one-fragment-per-server layout.  Returns the
    number of shards written; shards re-import and re-join on the global
    id_dim (same contract as fragment-of-cube import)."""
    import os

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    nparts = df.sparkSession.sparkContext.defaultParallelism

    def write_part(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = sorted((int(r["id_dim"]), list(r["measure"] or [])) for r in it)
        if not rows:
            return iter(())
        n = len(rows)
        width = max(len(m) for _, m in rows)
        data = np.full((n, width), np.nan, dtype=np.float64)
        ids = np.empty((n,), dtype=np.int32)
        for i, (rid, m) in enumerate(rows):
            ids[i] = rid
            data[i, : len(m)] = m
        write_classic(
            os.path.join(out_dir, f"part-{pid:05d}.nc"),
            dims=[("id_dim", n), ("array", width)],
            variables={var: (["id_dim", "array"], data),
                       "id_dim": (["id_dim"], ids)},
        )
        return iter((1,))

    shards = (
        df.select("id_dim", "measure")
        .repartitionByRange(nparts, F.col("id_dim").asc())
        .rdd.mapPartitions(write_part)
        .sum()
    )
    return int(shards)
