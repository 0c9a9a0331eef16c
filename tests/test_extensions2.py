

def test_kfold_split_component_coherent_and_balanced(spark):
    """Every near-dup component sits wholly inside ONE fold (the leakage
    guarantee), folds cover 0..k-1, and sizes stay within a loose
    hash-uniformity band."""
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    from .conftest import SF_SMOKE

    rows = REGISTRY["kfold_split"].fn(spark, SF_SMOKE).collect()
    n, k = len(rows), 5
    by_comp = {}
    fold_sizes = {}
    for r in rows:
        by_comp.setdefault(r.component, set()).add(r.fold)
        fold_sizes[r.fold] = fold_sizes.get(r.fold, 0) + 1
    assert all(len(folds) == 1 for folds in by_comp.values())
    assert set(fold_sizes) <= set(range(k))
    assert all(abs(sz - n / k) < 0.5 * n / k for sz in fold_sizes.values())
