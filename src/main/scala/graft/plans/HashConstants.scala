package graft.plans

/** THE prime modulus (and polynomial base) every integer-hash family in
  * the engine shares — MinHash base hashes, n-gram window hashes, CDC
  * boundaries, rolling fingerprints. One definition: the affine MinHash
  * signatures (mod P in [[graft.dedup.Dedup.MinHashLSH]]) and the fused
  * base hashes (mod P here) MUST agree, and every DuckDB oracle embeds
  * the same literal — a second copy that drifted would silently change
  * candidate generation until a hash gate tripped on an unrelated edit.
  */
object HashConstants {
  val P = 1000000007L
  val B = 131L
}
