"""Version canary for the Spark 4.1.2 pandas-UDF work-arounds.

Two engine-level work-arounds exist solely because of upstream Spark
4.1.2 defects observed at scale (SCALING.md "sf3.0 rung"; verify-skill
gotchas):

1. the minhash signature runs as a JVM expression
   (functions/text.py:minhash_signature_int) instead of the faster-at-
   small-scale Arrow pandas UDF, because AQE stage preparation lost the
   Python-UDF extraction from a warmed session's executed stage at
   sf3.0 stage stats ([INTERNAL_ERROR] ... InterpretedUnsafeProjection);
2. pandas-UDF-bearing caches build eagerly under non-adaptive capture
   (operators/similarity.py:_persist_udf_cache), because the second
   such cache build in a session died in the cache serializer.

This test pins the pyspark version those work-arounds were validated
against. On ANY other version it fails loudly with the retirement
checklist, so an upgrade cannot silently keep (or silently trust) the
work-arounds: re-validate, then either re-pin or retire.
"""

from __future__ import annotations

PINNED = "4.1.2"

RETIREMENT_CHECKLIST = """
pyspark version changed from the pinned {pinned} (found {found}).
The Spark-4.1.2 pandas-UDF work-arounds were validated ONLY on {pinned}.
On the new version, re-validate before re-pinning:
  1. python tools/repro_aqe_udf_extraction.py          # standalone shape
  2. the repo-state sweep the original crash needed: in ONE session run
     the q21/q28/q42/q46 family at .scale/sf1.0 and then .scale/sf3.0
     (tools/scalecheck.py does this; watch for [INTERNAL_ERROR]
     InterpretedUnsafeProjection / cache-serializer failures)
  3. tests/test_llm_operators.py::test_simhash_cache_rebuild_after_clear
If all three stay clean on the new Spark, consider retiring:
  - _persist_udf_cache's non-adaptive capture (plain persist suffices)
  - nothing else NEEDS to change: minhash_signature_int stays (it is
    also faster end-to-end at sf3.0, SCALING.md) — but the UDF path
    (functions/udfs.py:make_minhash_sig_udf) becomes safe to cache.
Then update PINNED here and the gotcha notes in
.claude/skills/verify/SKILL.md and SCALING.md.
"""


def test_spark_version_pin_for_udf_workarounds():
    import pyspark

    found = pyspark.__version__
    assert found == PINNED, RETIREMENT_CHECKLIST.format(
        pinned=PINNED, found=found
    )
