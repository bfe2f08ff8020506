package graft

/** The streaming latency bench axis is part of the per-round gate — a
  * broken harness would silently drop the serve tier's floors, so its
  * mechanics are spec-pinned at the smallest SF. */
class StreamBenchSpec extends SparkSpec {

  test("nearest-rank percentiles") {
    val xs = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    assert(StreamBench.pct(xs, 0.50) == 3.0)
    assert(StreamBench.pct(xs, 0.95) == 5.0)
    assert(StreamBench.pct(Seq(7.0), 0.50) == 7.0)
    intercept[IllegalArgumentException](StreamBench.pct(Nil, 0.5))
  }

  test("fixed workload yields all six latency metrics, positive and ordered") {
    val m = StreamBench.run(spark, sfDir)
    assert(m.keySet == Set("stream_serve_p50", "stream_serve_p95",
      "stream_serve_idx_p50", "stream_serve_idx_p95",
      "stream_docs_p50", "stream_docs_p95"))
    m.values.foreach(v => assert(v > 0.0 && v < 120.0, m))
    assert(m("stream_serve_p95") >= m("stream_serve_p50"), m)
    assert(m("stream_serve_idx_p95") >= m("stream_serve_idx_p50"), m)
    assert(m("stream_docs_p95") >= m("stream_docs_p50"), m)
  }
}
