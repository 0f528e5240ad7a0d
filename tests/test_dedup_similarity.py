

def test_connected_components_multihop_and_singletons(spark):
    """A-B, B-C chain collapses to one component (min id wins across hops);
    D-E is its own; F (no edges) stays a singleton labeled by itself."""
    from data_management_service_run_etl_imputations_spark.operators.dedup import (
        connected_components,
    )
    from pyspark.sql import functions as F

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6]], "id LONG")
    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (4, 5)], "id_a LONG, id_b LONG"
    )
    out = {
        r.id: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_connected_components_long_chain_converges(spark):
    """A 12-node path graph needs multiple propagation rounds; min label
    must reach the far end within the iteration cap."""
    from data_management_service_run_etl_imputations_spark.operators.dedup import (
        connected_components,
    )

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a LONG, id_b LONG"
    )
    out = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert out == {i: 0 for i in range(n)}
