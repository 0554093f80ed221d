package graft.decompose

import org.apache.spark.sql.DataFrame

/** Juhn–Murphy–Pierce change decomposition (D13,
  * `oaxaca_blinder/src/jmp.rs:44-106`): run the mean decomposition at
  * two time periods; total change = gap2 - gap1; quantity effect =
  * (dX2 - dX1)' beta*_1; price effect = d(explained) - quantity;
  * gap effect = d(unexplained).
  */
final case class JmpResults(
    totalChange: Double,
    quantityEffect: Double,
    priceEffect: Double,
    gapEffect: Double,
    period1: OaxacaResults,
    period2: OaxacaResults)

object Jmp {

  def run(df1: DataFrame, df2: DataFrame, cfg: OaxacaConfig): JmpResults = {
    val r1 = Oaxaca.run(df1, cfg)
    val r2 = Oaxaca.run(df2, cfg)
    val dx1 = r1.xaMean - r1.xbMean
    val dx2 = r2.xaMean - r2.xbMean
    val explained1 = r1.twoFold.find(_.name == "explained").get.estimate
    val explained2 = r2.twoFold.find(_.name == "explained").get.estimate
    val unexplained1 = r1.twoFold.find(_.name == "unexplained").get.estimate
    val unexplained2 = r2.twoFold.find(_.name == "unexplained").get.estimate

    val totalChange = r2.totalGap - r1.totalGap
    val quantity = (dx2 - dx1) dot r1.betaStar
    val price = (explained2 - explained1) - quantity
    val gapEffect = unexplained2 - unexplained1
    JmpResults(totalChange, quantity, price, gapEffect, r1, r2)
  }
}
