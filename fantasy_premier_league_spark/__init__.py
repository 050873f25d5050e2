"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `aditeyabaral/fantasy-premier-league`
(a Spark-DStream EPL match/event stream processor), rebuilt Spark-first:

- Structured Streaming + watermarked keyed state instead of chained
  ``updateStateByKey`` (reference ``master.py:353-371``);
- typed ``StructType`` schemas + native column expressions instead of
  per-record Python closures (reference ``master.py:48-138``);
- broadcast dim joins instead of driver-side point lookups
  (reference ``ui.py:41-42,129,142,149``);
- a pair-keyed DataFrame self-join instead of the O(n^2) in-memory
  chemistry dict (reference ``metrics.py:11-49``).

Plus the LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
