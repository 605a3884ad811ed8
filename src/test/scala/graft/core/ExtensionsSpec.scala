package graft.core

import graft.SparkSpec

/** The injected SQL function surface (GraftExtensions): every function
  * callable from plain `spark.sql` with no Scala imports.
  */
class ExtensionsSpec extends SparkSpec {

  it should "expose graft_polyhash to SQL" in {
    val h = spark.sql("SELECT graft_polyhash('ab') AS h")
      .collect().head.getLong(0)
    h shouldBe ('a'.toLong * 31 + 'b'.toLong) % 1000000007L
  }

  it should "expose graft_dot with deterministic left-to-right order" in {
    spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0) shouldBe 11.0
  }

  it should "expose graft_shingles and graft_shingle_set to SQL" in {
    spark.sql("SELECT graft_shingles(array('a','b','c','d'), 3) AS s")
      .collect().head.getSeq[String](0) shouldBe Seq("a b c", "b c d")
    // short input falls back to the token list
    spark.sql("SELECT graft_shingles(array('a','b'), 3) AS s")
      .collect().head.getSeq[String](0) shouldBe Seq("a", "b")
    // distinct keeps the first occurrence
    spark.sql("SELECT graft_shingle_set(array('x','y','x','y','x'), 2) AS s")
      .collect().head.getSeq[String](0) shouldBe Seq("x y", "y x")
    // n must be a literal
    an[Exception] should be thrownBy
      spark.sql("SELECT graft_shingles(array('a'), cast(rand()*2 AS INT))")
        .collect()
  }

  it should "expose graft_jaccard over array sets" in {
    spark.sql("SELECT graft_jaccard(array('a','b','c'), array('b','c','d')) AS j")
      .collect().head.getDouble(0) shouldBe 0.5
    // multiset inputs are dedup'd — set semantics hold for ANY input
    spark.sql("SELECT graft_jaccard(array('a','a'), array('a')) AS j")
      .collect().head.getDouble(0) shouldBe 1.0
    // both empty → null, not an ANSI divide-by-zero
    spark.sql("SELECT graft_jaccard(array(), array()) AS j")
      .collect().head.isNullAt(0) shouldBe true
  }

  it should "expose graft_hamming over long signatures" in {
    spark.sql("SELECT graft_hamming(11L, 8L) AS h")
      .collect().head.getInt(0) shouldBe 2 // 11 xor 8 = 0b0011
  }
}
