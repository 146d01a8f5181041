"""U1-U5 set-operation semantics (SURVEY.md §2.7) — kept as pytest coverage
after the users_vs_customers driver query was retired in the round-4
consolidation (VERDICT r03 'Next round' #1)."""


def test_union_dedup_diff_intersect(spark):
    a = spark.range(10).selectExpr("id")
    b = spark.range(5, 15).selectExpr("id")
    assert a.intersect(b).count() == 5
    assert a.exceptAll(b).count() == 5
    assert a.union(b).count() == 20
    assert a.union(b).distinct().count() == 15
    # multiset semantics: duplicates survive union, exceptAll subtracts
    # per-occurrence
    dup = a.union(a)
    assert dup.exceptAll(a).count() == 10
    assert dup.distinct().count() == 10
