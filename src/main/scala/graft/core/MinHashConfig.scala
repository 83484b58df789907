package graft.core

/** The engine's "query": the MinHash/LSH parameterization, mirroring the
  * reference's `struct Arguments` (/root/reference/src/MPI/structures.h:15-38)
  * with the reference defaults (/root/reference/src/MPI/io_interface.c:77-99).
  *
  * The divisibility requirement and derived band count follow
  * /root/reference/src/MPI/io_interface.c:67-72 (SURVEY.md Q9).
  *
  * Carried into Spark closures as a plain Scala value — no broadcast
  * machinery needed (closure serialization replaces the reference's
  * MPI_Bcast of the args struct).
  */
final case class MinHashConfig(
    shingleSize: Int = 3,
    signatureSize: Int = 100,
    nBandRows: Int = 4,
    seed: Int = 13,
    threshold: Double = 0.1,
    docOffset: Long = 0L
) {
  require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
  require(signatureSize >= 1, s"signatureSize must be >= 1, got $signatureSize")
  require(nBandRows >= 1, s"nBandRows must be >= 1, got $nBandRows")
  require(
    signatureSize % nBandRows == 0,
    s"signatureSize ($signatureSize) must be divisible by nBandRows ($nBandRows)"
  )
  val nBands: Int = signatureSize / nBandRows
}
