package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.cdc.{Transform, TxAssembly, Wal2Json}
import graft.streaming.CdcStream

/** Randomized equivalence property for the fused assembly+replay-dedup
  * operator: for ANY interleaving of transactions, ANY micro-batch split,
  * and ANY at-least-once re-delivery of already-processed offset ranges
  * (including mid-transaction slices), the streaming pipeline must emit
  * exactly the batch pipeline's events over the distinct original WAL —
  * same event ids, same commit stamps, same sequence ordinals.
  */
class StreamingEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val ts = "2024-01-15 10:30:00.123456+00"

  private def line(ws: Long, action: String, xid: Long, id: Long): (Long, String) =
    action match {
      case "B" | "C" => (ws, s"""{"action":"$action","xid":$xid,"timestamp":"$ts"}""")
      case a => (ws,
        s"""{"action":"$a","xid":$xid,"timestamp":"$ts","schema":"public","table":"t","columns":[{"name":"id","type":"bigint","value":$id}]}""")
    }

  /** Random WAL: `nTx` transactions, events interleaved across txs, each
    * tx's B first and C last (the WAL contract), positions strictly
    * increasing.
    */
  private def randomWal(rnd: scala.util.Random, nTx: Int): Vector[(Long, String)] = {
    // per tx: a B, 1-4 events, a C — interleave by repeatedly picking a
    // random open tx and emitting its next item
    val remaining = scala.collection.mutable.Map[Int, Int]() // txid -> events left
    val begun = scala.collection.mutable.Set[Int]()
    (1 to nTx).foreach(t => remaining(t) = 1 + rnd.nextInt(4))
    val out = Vector.newBuilder[(Long, String)]
    var ws = 0L // deliberately starts at position 0
    var evId = 0L
    while (remaining.nonEmpty) {
      val tx = remaining.keys.toSeq.sorted.apply(rnd.nextInt(remaining.size))
      if (!begun(tx)) {
        out += line(ws, "B", tx, 0); ws += 1; begun += tx
      } else if (remaining(tx) > 0) {
        out += line(ws, "I", tx, evId); ws += 1; evId += 1
        remaining(tx) -= 1
      } else {
        out += line(ws, "C", tx, 0); ws += 1
        remaining.remove(tx)
      }
    }
    out.result()
  }

  test("streaming ≡ batch over random interleavings, batch splits, and replay slices") {
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val wal = randomWal(rnd, nTx = 12)

      // micro-batch schedule: split the WAL at random points, and after
      // some batches re-deliver a random slice of everything sent so far
      // (an at-least-once redelivery can cut mid-transaction)
      val splits = (wal.indices.filter(_ => rnd.nextDouble() < 0.15) :+ wal.size).distinct.sorted
      val batches = scala.collection.mutable.ArrayBuffer[Seq[(Long, String)]]()
      var prev = 0
      splits.foreach { s =>
        if (s > prev) {
          batches += wal.slice(prev, s)
          if (rnd.nextDouble() < 0.5) {
            val lo = rnd.nextInt(s); val hi = lo + 1 + rnd.nextInt(s - lo)
            batches += wal.slice(lo, hi) // replayed offset range
          }
          prev = s
        }
      }

      implicit val sctx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val out = s"equiv_out_$seed"
      val q = CdcStream.pipeline(spark, input.toDF().toDF("wal_start", "data"), "testdb")
        .writeStream.outputMode("append").format("memory").queryName(out).start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        val streamedRows = spark.table(out)
          .select($"event_id", $"lsn", $"txid", $"commit_time")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            String.valueOf(r.getTimestamp(3))))
        val streamed = streamedRows.toSet
        // multiplicity matters: a dedup regression re-emitting a replayed
        // tx would survive a Set compare — row count must match too
        assert(streamedRows.length == streamed.size,
          s"seed=$seed: duplicate emissions: ${streamedRows.groupBy(identity).filter(_._2.length > 1).keys}")

        val batchExpected = Transform.normalize(
            TxAssembly.assemble(Wal2Json.decode(wal.toDF("wal_start", "data"))), "testdb")
          .select($"event_id", $"lsn", $"txid", $"commit_time")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            String.valueOf(r.getTimestamp(3)))).toSet

        assert(streamed == batchExpected,
          s"seed=$seed: stream-only=${streamed -- batchExpected} " +
            s"batch-only=${batchExpected -- streamed}")
      } finally q.stop()
    }
  }
}
