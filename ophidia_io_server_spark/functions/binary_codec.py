"""Binary pack/unpack + zlib codec kernels (oph_to_bin / oph_from_bin /
oph_compress / oph_uncompress / oph_dump backing).

The reference stores measures as packed little-endian byte blobs
(``/root/reference/src/common/oph-lib-binary-io.h:60-68``); Spark stores them
as typed arrays, so these codecs only exist at the wire/compat boundary.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType


@F.pandas_udf(BinaryType())
def to_bin_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda a: np.asarray(a, dtype="<f8").tobytes())


@F.pandas_udf(ArrayType(DoubleType()))
def from_bin_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda b: np.frombuffer(b, dtype="<f8").tolist())


@F.pandas_udf(BinaryType())
def compress_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda a: zlib.compress(np.asarray(a, dtype="<f8").tobytes(), 6))


@F.pandas_udf(ArrayType(DoubleType()))
def uncompress_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda b: np.frombuffer(zlib.decompress(bytes(b)), dtype="<f8").tolist())
