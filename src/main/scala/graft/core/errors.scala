package graft.core

/** Engine error taxonomy.
  *
  * Mirrors the trigger points of the reference's error enums
  * (`oaxaca_blinder/src/error.rs:5-19`, `akm.rs:7-12`): missing column,
  * invalid group variable, singular system, insufficient data, failed
  * convergence, bad weights.
  */
sealed abstract class EngineError(msg: String) extends RuntimeException(msg)

final case class ColumnNotFound(col: String)
    extends EngineError(s"Column not found: $col")

final case class InvalidGroupVariable(msg: String) extends EngineError(msg)

final case class SingularMatrix(msg: String) extends EngineError(msg)

final case class InsufficientData(msg: String) extends EngineError(msg)

final case class ConvergenceFailed(msg: String) extends EngineError(msg)

final case class InvalidWeights(msg: String) extends EngineError(msg)

final case class DiagnosticError(msg: String) extends EngineError(msg)

final case class InvalidArgument(msg: String) extends EngineError(msg)
