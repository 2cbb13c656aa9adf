package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Shard-function properties ported from the reference's own test suite
  * (/root/reference/internal/binwatch/blsenderwork/blsenderwork_test.go):
  * disabled passthrough (:42-49), exactly-one-shard + ≤20% skew over 3000
  * sequential positions (:53-83), even-byte-step regression (:90-121),
  * key affinity/spread (:125-158, :161-190). Same bounds, same scenarios;
  * the assertions here run against our FNV-1a implementation. */
class ShardingSpec extends AnyFunSuite {

  test("count<=1 processes everything (disabled sharding)") {
    // Sharding.shardFilter returns lit(true) for count<=1; the scalar
    // equivalent: every position owned by shard 0 of 1.
    (0 until 100).foreach { p =>
      assert(Sharding.fnvShardOfPosition(p.toLong, 1) == 0)
    }
  }

  test("every event is owned by exactly one shard; union covers all") {
    val count = 3
    val positions = (1 to 3000).map(_.toLong * 17 + 4)
    positions.foreach { p =>
      val owners = (0 until count).filter(i => Sharding.fnvShardOfPosition(p, count) == i)
      assert(owners.size == 1)
    }
  }

  test("balance: ≤20% skew over 3000 sequential positions, 2 and 3 shards") {
    for (count <- Seq(2, 3)) {
      val positions = (1 to 3000).map(_.toLong)
      val byShard = positions.groupBy(Sharding.fnvShardOfPosition(_, count))
      val ideal = 3000.0 / count
      byShard.foreach { case (_, ps) =>
        assert(math.abs(ps.size - ideal) / ideal <= 0.20,
          s"shard skew ${ps.size} vs ideal $ideal at count=$count")
      }
    }
  }

  test("even-byte-step regression: raw pos%count collapses, FNV rebalances") {
    // Positions stepping by a multiple of the shard count (e.g. events of
    // identical byte size): naive modulo puts ALL on one shard.
    val count = 2
    val step = 150L
    val positions = (1 to 3000).map(i => 1000L + i * step)
    val naive = positions.groupBy(p => (p % count).toInt)
    assert(naive.size == 1, "precondition: naive modulo collapses")
    val fnv = positions.groupBy(Sharding.fnvShardOfPosition(_, count))
    val ideal = 3000.0 / count
    assert(fnv.size == count)
    fnv.foreach { case (_, ps) =>
      assert(math.abs(ps.size - ideal) / ideal <= 0.20)
    }
  }

  test("key template: same key always lands on the same shard (affinity)") {
    val keys = (1 to 500).map(i => s"row-key-$i")
    for (count <- Seq(2, 3, 5)) {
      keys.foreach { k =>
        val owners = (1 to 10).map(_ => Sharding.fnvShardOfKey(k, count)).distinct
        assert(owners.size == 1)
      }
    }
  }

  test("key template: distinct keys spread within 20% skew") {
    val keys = (1 to 3000).map(i => s"user-$i")
    for (count <- Seq(2, 3)) {
      val byShard = keys.groupBy(Sharding.fnvShardOfKey(_, count))
      val ideal = 3000.0 / count
      byShard.foreach { case (_, ks) =>
        assert(math.abs(ks.size - ideal) / ideal <= 0.20)
      }
    }
  }

  test("FNV-1a 64 known vectors (spec test values)") {
    // Public FNV-1a test vectors: empty string and "a".
    assert(Sharding.fnv1a64(Array.emptyByteArray) == 0xcbf29ce484222325L)
    assert(Sharding.fnv1a64("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
  }
}
