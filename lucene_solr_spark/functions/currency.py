"""CurrencyField re-expression (solr/core/src/java/org/apache/solr/
schema/CurrencyField.java): money values stored as (long amount in
minor units, currency code), converted between currencies at query
time through an ExchangeRateProvider.

Reference rules kept exactly:
- getExchangeRate (:684-706): same code -> 1.0; direct rate; else the
  INVERSE of the opposite-direction rate (1.0 / symmetricRate); else
  error. Asymmetric rate tables are allowed by design.
- convertAmount (:980-1009): same code returns the amount UNCHANGED
  (no double round-trip); otherwise value = (double)amount * rate,
  then fraction-digit alignment by SEQUENTIAL *0.1 / *10.0 multiplies
  (the loop, not pow — order matters in IEEE), then (long) truncation
  toward zero.

Execution shape: rates and fraction digits are tiny driver-side
lookups (the reference's per-ord exchangeRateCache, :576-586); the
per-row conversion compiles to ONE Catalyst CASE over the currency
code — whole-stage codegen, no UDF, no join."""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

# java.util.Currency.getDefaultFractionDigits for the common codes
FRACTION_DIGITS = {"USD": 2, "EUR": 2, "GBP": 2, "JPY": 0, "KWD": 3}


class ExchangeRateProvider:
    """FileExchangeRateProvider's lookup semantics over an in-memory
    rate table {(src, tgt): rate} (the currency.xml content)."""

    def __init__(self, rates: Dict[Tuple[str, str], float]):
        self.rates = dict(rates)

    def get_exchange_rate(self, src: str, tgt: str) -> float:
        if src == tgt:
            return 1.0
        direct = self.rates.get((src, tgt))
        if direct is not None:
            return float(direct)
        sym = self.rates.get((tgt, src))
        if sym is not None:
            return 1.0 / float(sym)
        raise KeyError(f"No available conversion rate between "
                       f"{src} to {tgt}")


def convert_amount_col(amount: Column, code: Column, target: str,
                       provider: ExchangeRateProvider,
                       codes, fraction_digits=None) -> Column:
    """CurrencyValue.convertAmount as one Catalyst CASE over the
    currency codes present (``codes``): same-code rows pass through
    unchanged; others multiply by the provider rate, align fraction
    digits by nested sequential *10.0 / *0.1 multiplies, and truncate
    toward zero to a long."""
    fd = fraction_digits or FRACTION_DIGITS
    tgt_frac = fd[target]
    expr = None
    for c in codes:
        if c == target:
            val = amount.cast("long")
        else:
            rate = provider.get_exchange_rate(c, target)
            v = amount.cast("double") * F.lit(rate)
            delta = tgt_frac - fd[c]
            for _ in range(abs(delta)):
                v = v * F.lit(10.0 if delta > 0 else 0.1)
            # (long) truncation toward zero
            val = (F.signum(v) * F.floor(F.abs(v))).cast("long")
        cond = code == c
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr
