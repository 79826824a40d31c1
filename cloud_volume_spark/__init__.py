"""cloud_volume_spark — a PySpark-native analytics engine with the
capabilities of seung-lab/cloud-volume.

A volume is a DataFrame of chunks ``(mip, cx, cy, cz, morton, encoding,
blob)`` plus a JSON ``info`` catalog (reference:
``datasource/precomputed/metadata.py``). Every cloud-volume operation is
a relational plan over that table: partition-pruned scan → codec pandas
UDF → assemble / aggregate / rewrite.

Layers:
- ``geometry``  — Vec/Bbox predicate algebra (reference ``lib.py:263-1013``)
- ``catalog``   — ``info`` JSON catalog (reference ``metadata.py:77-155``)
- ``codecs``    — per-chunk encode/decode UDF kernels (reference ``chunks.py``)
- ``volume``    — Volume reader/writer: cutout, write, unique, remap …
- ``meshes`` / ``skeletons`` / ``annotations`` / ``spatial_index`` —
  sibling object layers as keyed DataFrames
- ``precomputed_io`` / ``sharding`` / ``zarr_io`` / ``multilod`` —
  ecosystem format interop (precomputed unsharded+sharded, zarr v2/v3,
  n5, multi-LOD mesh manifests)
- ``graphene``  — supervoxel→root mapping tables with as-of timestamps
- ``streaming`` — Structured Streaming extensions (windowed/session
  aggregation, stateful label envelopes, annotation ingest)
- ``operators`` — relational + training-data-pipeline operators
  (dedup, similarity, text analysis) over ordinary DataFrames
"""

from cloud_volume_spark.session import get_spark
from cloud_volume_spark.geometry import Vec, Bbox
from cloud_volume_spark.catalog import VolumeInfo
from cloud_volume_spark.volume import Volume
from cloud_volume_spark.annotations import AnnotationLayer
from cloud_volume_spark.meshes import MeshLayer
from cloud_volume_spark.skeletons import SkeletonLayer
from cloud_volume_spark.spatial_index import SpatialIndex
from cloud_volume_spark.images import save_images
from cloud_volume_spark.ann_index import IVFIndex, build_ivf_index

__version__ = "0.1.0"

__all__ = [
    "get_spark", "Vec", "Bbox", "VolumeInfo", "Volume",
    "AnnotationLayer", "MeshLayer", "SkeletonLayer", "SpatialIndex",
    "save_images", "IVFIndex", "build_ivf_index", "__version__",
]
