"""Arrow-batched pandas UDFs wrapping the numpy kernels.

These are the ONLY JVM<->Python boundaries in the engine. Everything inside
is whole-array numpy (no per-row Python), per the input_hint contract.
Relational algebra around them stays in Catalyst/WholeStageCodegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_LATLNG = StructType([StructField("lat", DoubleType()), StructField("lng", DoubleType())])
_FACEIJ = StructType(
    [StructField("face", IntegerType()), StructField("i", LongType()), StructField("j", LongType())]
)
_XYZ = StructType(
    [StructField("x", DoubleType()), StructField("y", DoubleType()), StructField("z", DoubleType())]
)

from ..kernel import cellid as s2


@pandas_udf(LongType())
def _cell_id_from_latlng_deg(lat: pd.Series, lng: pd.Series, level: pd.Series) -> pd.Series:
    ids = s2.latlng_degrees_to_cell_id(
        lat.to_numpy(np.float64), lng.to_numpy(np.float64), level.to_numpy(np.int64)
    )
    return pd.Series(s2.to_signed(ids))


def cell_id_from_latlng_deg(lat, lng, level) -> Column:
    """Leaf-or-level cell id (raw-bits int64) from lat/lng degrees columns."""
    lvl = F.lit(level) if isinstance(level, int) else level
    return _cell_id_from_latlng_deg(lat, lng, lvl)


@pandas_udf(LongType())
def _cell_id_from_face_ij(face: pd.Series, i: pd.Series, j: pd.Series) -> pd.Series:
    ids = s2.from_face_ij(
        face.to_numpy(np.int64), i.to_numpy(np.int64), j.to_numpy(np.int64)
    )
    return pd.Series(s2.to_signed(ids))


def cell_id_from_face_ij(face, i, j) -> Column:
    return _cell_id_from_face_ij(face, i, j)


@pandas_udf(_LATLNG)
def _cell_id_to_latlng_deg(cid: pd.Series) -> pd.DataFrame:
    lat, lng = s2.cell_id_to_latlng(s2.from_signed(cid.to_numpy(np.int64)))
    return pd.DataFrame({"lat": np.degrees(lat), "lng": np.degrees(lng)})


def cell_id_to_latlng_deg(cid) -> Column:
    """Cell center as struct<lat,lng> degrees."""
    return _cell_id_to_latlng_deg(cid)


@pandas_udf(_FACEIJ)
def _cell_id_to_face_ij(cid: pd.Series) -> pd.DataFrame:
    f, i, j, _ = s2.to_face_ij_orientation(s2.from_signed(cid.to_numpy(np.int64)))
    return pd.DataFrame({"face": f.astype(np.int32), "i": i, "j": j})


def cell_id_to_face_ij(cid) -> Column:
    return _cell_id_to_face_ij(cid)


@pandas_udf(StringType())
def _cell_token(cid: pd.Series) -> pd.Series:
    return pd.Series(s2.to_token(s2.from_signed(cid.to_numpy(np.int64))))


def cell_token(cid) -> Column:
    """Hex token via the numpy kernel (columns.token is the pure-SQL twin)."""
    return _cell_token(cid)


@pandas_udf(LongType())
def _cell_from_token(tok: pd.Series) -> pd.Series:
    return pd.Series(s2.to_signed(s2.from_token(tok.to_numpy(object))))


def cell_from_token(tok) -> Column:
    return _cell_from_token(tok)


@pandas_udf(IntegerType())
def _face_from_latlng_deg(lat: pd.Series, lng: pd.Series) -> pd.Series:
    x, y, z = s2.latlng_to_xyz(
        np.radians(lat.to_numpy(np.float64)), np.radians(lng.to_numpy(np.float64))
    )
    return pd.Series(s2.xyz_to_face(x, y, z).astype(np.int32))


def face_from_latlng_deg(lat, lng) -> Column:
    return _face_from_latlng_deg(lat, lng)


@pandas_udf(_XYZ)
def _latlng_deg_to_xyz(lat: pd.Series, lng: pd.Series) -> pd.DataFrame:
    x, y, z = s2.latlng_to_xyz(
        np.radians(lat.to_numpy(np.float64)), np.radians(lng.to_numpy(np.float64))
    )
    return pd.DataFrame({"x": x, "y": y, "z": z})


def latlng_deg_to_xyz(lat, lng) -> Column:
    return _latlng_deg_to_xyz(lat, lng)


@pandas_udf(ArrayType(LongType()))
def _all_neighbors(cid: pd.Series) -> pd.Series:
    nb = s2.get_all_neighbors_same_level(s2.from_signed(cid.to_numpy(np.int64)))
    signed = nb.view(np.int64)
    return pd.Series(list(signed))


def all_neighbors(cid) -> Column:
    """The 8 same-level edge+vertex neighbors as array<long> (may contain
    duplicates at cube corners, like the reference)."""
    return _all_neighbors(cid)
