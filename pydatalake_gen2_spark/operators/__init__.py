"""Engine helper operators — the only real "engine code" (SURVEY.md §7.4).

Everything here composes public DataFrame/SQL APIs; no custom Catalyst
rules (SURVEY.md §4.2 concludes none are needed).
"""
