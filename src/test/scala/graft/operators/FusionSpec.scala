package graft.operators

import graft.SparkSpec

/** RRF fusion: hand-computed scores, agreement dominance, tie order. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: hand-computed fusion — agreement beats a single first place") {
    // list A: 1 > 2 > 3 ; list B: 2 > 3 > 4
    val a = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "s")
    val b = Seq((2L, 9.0), (3L, 8.0), (4L, 7.0)).toDF("id", "s")
    val out = Fusion.rrf(Seq(a, b), "id", "s", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byId = out.map(x => x._1 -> x).toMap
    def r(ranks: Int*) = ranks.map(x => 1.0 / (60 + x)).sum
    assert(math.abs(byId(2L)._2 - r(2, 1)) < 1e-15)
    assert(math.abs(byId(1L)._2 - r(1)) < 1e-15)
    assert(byId(2L)._3 == 2 && byId(1L)._3 == 1)
    // doc 2 (rank 2 + rank 1) beats doc 1 (single rank 1): agreement wins
    assert(out.head._1 == 2L, out.mkString(","))
    assert(out.map(_._1).toSeq == Seq(2L, 3L, 1L, 4L),
      s"full order: ${out.map(_._1).toSeq}")
  }

  test("rrf: score ties rank deterministically by id; k bounds the result") {
    val tied = Seq((5L, 1.0), (3L, 1.0), (9L, 1.0)).toDF("id", "s")
    val out = Fusion.rrf(Seq(tied), "id", "s", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // tie-break id asc: 3 gets rank 1, 5 rank 2; k=2 cuts 9
    assert(out.map(_._1).toSeq == Seq(3L, 5L))
    assert(math.abs(out.head._2 - 1.0 / 61) < 1e-15)
  }
}
