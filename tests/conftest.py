import pytest

from kgw_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app_name="kgw_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_corpus():
    from kgw_spark.sources.corpus import generate_corpus

    return generate_corpus(n_repos=8, files_per_repo=12, seed=42)


def alias_df_from_truth(spark, truth):
    rows = [
        {"alias_id": a, "canonical_id": c, "score": float(s)}
        for a, (c, s) in truth.alias_dict.items()
    ]
    return spark.createDataFrame(rows, schema="alias_id string, canonical_id string, score double")
