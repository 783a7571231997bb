package graft.operators

/** Trained coefficients for [[Curation.qualityClassifier]].
  *
  * 1024-bucket hashed-unigram logistic regression fit OFFLINE by
  * `tools/train_quality.py` (deterministic, re-runnable: a synthetic
  * prose-vs-junk corpus labeled by the real Gopher rule suite, plain
  * full-batch gradient descent, coefficients quantized x1000 to
  * integers so scoring replays exactly in the DuckDB oracle).
  * Held-out quality at training time: accuracy 0.93, AUC 0.98
  * (CurationSpec re-checks the AUC claim on a freshly generated
  * held-out corpus every run).
  *
  * Keep rule: `Bias + sum(W(bucket(token)))  > 0`.
  */
object QualityWeights {
  val Buckets: Int = 1024
  val Bias: Long = -3812L
  val W: Array[Long] = Array(
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 23L, 0L, 201L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    -142L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 8L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 241L, 0L, 0L, 0L, 0L, 0L, 0L, 373L, 16L, 97L, 0L, 0L, 0L, 0L,
    -317L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    -47L, 0L, -210L, 0L, 0L, 0L, 0L, 0L, 424L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, -214L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 24L, 23L, 0L, 36L, 0L, 0L, 0L, 0L, 0L, 18L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 42L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, -40L, 0L, 0L, 0L, 377L, -276L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, -71L, 329L, 0L, 0L, 0L, 0L, 0L, 234L, 0L, -469L,
    0L, 0L, 89L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 36L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 259L, 0L, 0L, 0L, 0L, 0L,
    298L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 156L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 704L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -57L, 0L, 0L,
    0L, 0L, 334L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 175L, 19L, 0L, 0L, -244L, 0L,
    0L, 0L, 0L, 0L, -495L, 0L, 0L, 0L, 0L, -3L, 0L, 0L, 77L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, -267L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 100L, 0L, 0L, 0L, 0L, 0L, 165L, 0L, 0L, 0L,
    97L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -11L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 97L, 0L, 0L, -38L,
    0L, 0L, 0L, 0L, 0L, 0L, -144L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 669L, 0L, 0L, 0L, 0L, 0L, -116L, 0L, 0L, 0L, 0L, 0L, 0L, 35L, 0L,
    0L, 356L, 0L, -44L, 0L, 0L, 0L, 0L, -58L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 265L, 0L, 0L, 0L, 0L, 0L, 0L, -133L, 0L, 0L, 0L, 0L, 0L, 0L, 168L,
    0L, 0L, 0L, 0L, 390L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    324L, -13L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -177L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 533L, 0L, 0L, 155L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 222L, 0L,
    0L, 0L, 0L, 0L, 0L, 139L, 156L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 552L, 0L, 0L, 0L, 0L, 0L, 194L, 0L, 461L, 0L, 0L, 0L, 0L,
    0L, 0L, 304L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 257L, 0L, 170L, 0L, 102L, 0L, 0L, 73L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    -316L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 552L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, -186L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 146L, 0L, 0L, 0L, 0L, 0L, 387L, 0L, 0L, 0L, -360L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -31L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 237L, 0L, 0L, -25L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -165L,
    0L, 91L, 0L, 229L, -227L, 0L, 0L, 0L, 0L, 0L, 359L, 0L, -41L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 77L, 0L, 130L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -104L, 0L, 0L, 0L, 0L, 102L, 0L, -53L,
    0L, 0L, 0L, 0L, 0L, 0L, 44L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -107L,
    394L, 0L, 0L, 0L, 0L, 0L, 0L, 54L, 0L, 0L, 0L, 0L, 0L, 502L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 80L, 0L, 235L, 41L, 0L, 0L, 0L, 576L, 0L, 0L,
    0L, 0L, 0L, 125L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 238L,
    381L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -170L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, -402L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    -132L, 0L, 0L, 278L, 0L, 0L, 0L, -80L, 0L, 0L, 1L, 0L, 0L, 0L, -212L,
    0L, 186L, 0L, 0L, 0L, 0L, 0L, 103L, 0L, 406L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, -305L, 17L, 125L, 0L, 0L, 0L, 0L, -55L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 184L, 0L, 28L, 0L, -317L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 34L, 0L, 0L, 0L, 0L, 0L, -63L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 304L, 0L, 260L, 346L, -604L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 28L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 90L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -359L, 0L, 54L, 0L, 0L, 0L, 0L,
    -38L, -1L, 0L, -181L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 452L, 0L, 200L, 0L, 0L, 0L, 0L, 0L, 0L, -370L, 0L)
}
