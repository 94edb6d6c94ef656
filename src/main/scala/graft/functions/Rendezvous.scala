package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1996, the public algorithm behind stable shard placement: a key's
  * shard is argmax over shards of a per-(key, shard) weight. The property
  * that matters at 100 TB: growing n → n+1 shards, a key moves ONLY if
  * the new shard wins its argmax, so exactly ~1/(n+1) of keys move and
  * EVERY move lands on the new shard — existing shards never exchange
  * data (naive `hash(key) mod n` reshuffles ~everything). That is the
  * difference between appending one directory to a published dataset and
  * rewriting all of it.
  *
  * Weight = (k′ · Pₛ) mod p with k′ = pmod(key, 1000003) + 1, p =
  * 1000000007 prime, and Pₛ = 1103515245^(s+1) mod p a PLAN-TIME
  * constant per shard (the jlSigns rule: pseudo-randomness rendered as
  * literals into both engines — no engine hash function; every product
  * ≤ ~1e15, far under the 2^63 DuckDB-raises-on-overflow ceiling).
  * The multiplicative family matters: an additive `A + s·c` weight is
  * monotone in s whenever s·c < p and silently assigns ~everything to
  * the last shard — caught by RendezvousSpec's balance law, not by the
  * cross-engine gate, which both engines fail identically. Balance
  * measured ±4% over uniform keys; movement 10→11 shards ≈ 9%.
  *
  * Ties are IMPOSSIBLE, not just broken: k′·Pₛ₁ ≡ k′·Pₛ₂ (mod p) needs
  * Pₛ₁ ≡ Pₛ₂ (k′ ∈ [1, p)), i.e. 1103515245^(s₁−s₂) ≡ 1 — but the
  * base's multiplicative order divides p−1 = 2·500000003 (both prime
  * factors) and is provably > 64, so the 64 multipliers are distinct
  * and the oracle may use a plain MAX(w) join-back with no tie rule.
  *
  * The argmax is `greatest(...)` over one struct per shard — a codegen'd
  * narrow map, no explode, no shuffle.
  */
object Rendezvous {

  val P: Long = 1000000007L

  /** Pₛ = 1103515245^(s+1) mod p — REPLICATED as literals in the s14
    * oracle; change both or neither. */
  def multiplier(shard: Int): Long = {
    var acc = 1L
    var i = 0
    while (i <= shard) { acc = acc * 1103515245L % P; i += 1 }
    acc
  }

  private def weight(key: Column, shard: Int): Column =
    (pmod(key, lit(1000003L)) + 1L) * lit(multiplier(shard)) % P

  /** Shard id in [0, nShards) for a long key column. */
  def assign(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 64,
      s"nShards must be in [1, 64] (one struct per shard in the plan), got $nShards")
    if (nShards == 1) lit(0)
    else {
      val candidates = (0 until nShards).map(s =>
        struct(weight(key, s).as("w"), lit(s).as("s")))
      greatest(candidates: _*).getField("s")
    }
  }
}
