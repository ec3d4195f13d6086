"""Forward-geocode pipeline, broadcast-join variant (SURVEY.md §3.2).

    read images (image_id, caption)                  [bytes never read]
      -> map_batches(ForwardJoiner, actor pool)      [broadcast GazetteerIndex]

For a gazetteer too large to broadcast, use
``pipelines.forward_shuffle`` (token-key co-shuffle with salting).
"""

from __future__ import annotations

import pyarrow.parquet as pq

from ..config import ForwardConfig
from ..stages.forward import ForwardJoiner, GazetteerIndex


def build_gazetteer_index_ref(gazetteer_path: str):
    import ray

    return ray.put(GazetteerIndex(pq.read_table(gazetteer_path)))


def run_forward(
    images_path: str,
    gazetteer_path: str,
    config: ForwardConfig = ForwardConfig(),
    concurrency: int | tuple[int, int] = 4,
    batch_size: int | None = None,
    index_ref=None,
    query_col: str = "caption",
    id_col: str = "image_id",
):
    import ray.data as rd

    if index_ref is None:
        index_ref = build_gazetteer_index_ref(gazetteer_path)

    ds = rd.read_parquet(images_path, columns=[id_col, query_col])
    ds = ds.map_batches(
        ForwardJoiner,
        fn_constructor_args=(index_ref, config),
        fn_constructor_kwargs={"query_col": query_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return ds
