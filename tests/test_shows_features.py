"""Reference demo-feature parity over the shows fixture.

The reference's feature calculators (movie_and_tv_show_features.graphqls:19-31)
bind: castCount = list_size(cast) (default arg []), releaseDecade =
extract_decade(release_year); duration parsing feeds the Movie/TV Show
subtype split (FIXTURES.md §4)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.plans.model import FeatureModel


@pytest.fixture(scope="module")
def shows(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "shows.parquet"))


def test_cast_count_and_release_decade(spark, shows):
    m = FeatureModel(entity_key="show_id", order=("show_id",), event_time="date_added")
    m.declare_transformer_feature("castCount", "list_size", args=["cast"])
    m.declare_transformer_feature("releaseDecade", "extract_decade", args=["release_year"])
    m.alias("cast_count", "castCount")

    out = (
        m.materialize(shows, ["show_id", "castCount", "releaseDecade", "release_year", "cast"])
        .orderBy("show_id")
        .toPandas()
    )
    # castCount: size of the array, 0 for empty (golden: [] -> 0)
    assert (out["castCount"] == out["cast"].map(len)).all()
    # releaseDecade: year % 100 for >= 1900, NULL below (golden: 1899 -> NULL)
    expected = out["release_year"].map(lambda y: y % 100 if y >= 1900 else None)
    got = out["releaseDecade"]
    same = (got == expected) | (got.isna() & expected.isna())
    assert same.all()
    # fixture includes the <1900 NULL branch
    assert got.isna().any() and (out["release_year"] < 1900).any()


def test_subtype_discriminator_split(spark, shows):
    """@subtyping/@discriminator analog: Movie vs TV Show wide-schema split."""
    movies = shows.filter(F.col("type") == "Movie")
    tv = shows.filter(F.col("type") == "TV Show")
    assert movies.filter(F.col("duration_min").isNull()).count() == 0
    assert movies.filter(F.col("num_seasons").isNotNull()).count() == 0
    assert tv.filter(F.col("num_seasons").isNull()).count() == 0
    assert tv.filter(F.col("duration_min").isNotNull()).count() == 0
