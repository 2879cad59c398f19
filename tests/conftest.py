from __future__ import annotations

import pytest

from ovalspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ovalspark-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_world(spark):
    """Shared clean generated world: (spec, catalog, documents, assets)."""
    from ovalspark.datagen import GenSpec, generate_assets, generate_catalog, generate_documents

    spec = GenSpec(n_runners=2, n_writers=2, docs_per_writer=200, max_spans=8, seed=42, n_assets=1 << 16)
    cat = generate_catalog(spark, spec).cache()
    docs = generate_documents(cat, spec).cache()
    assets = generate_assets(spark, spec).cache()
    cat.count(), docs.count(), assets.count()
    return spec, cat, docs, assets
