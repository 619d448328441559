#!/usr/bin/env python3
"""Dev-only generator for the committed CNJ fixture corpus + golden output.

Writes deterministic small CSVs to src/test/resources/cnj/dados/ covering
every code path of the reference pipeline (FIXTURES.md §1 matrix), then
computes the expected ResumoMetas via an independent pandas
re-implementation of the documented semantics (SURVEY.md §2.4/§4) and
writes it as the golden src/test/resources/cnj/golden_resumo.csv.

Run once; outputs are committed. Not part of the shipped library.
"""
import math
import os
import random

import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
BASE = os.path.join(HERE, "..", "src", "test", "resources", "cnj")
DADOS = os.path.join(BASE, "dados")
os.makedirs(DADOS, exist_ok=True)

rng = random.Random(42)

FACTORS = {
    'Justiça Estadual': {
        '2a': 1000/8, '2b': 1000/9, '2c': 1000/9.5, '2ant': 100,
        '4a': 1000/6.5, '4b': 100, '6': 100,
        '7a': 1000/5, '7b': 1000/5, '8a': 1000/7.5, '8b': 1000/9,
        '10a': 1000/9, '10b': 1000/10},
    'Justiça do Trabalho': {'2a': 1000/9.4, '2ant': 100, '4a': 1000/7, '4b': 100},
    'Justiça Federal': {
        '2a': 1000/8.5, '2b': 100, '2ant': 100, '4a': 1000/7, '4b': 100,
        '6': 1000/3.5, '7a': 1000/3.5, '7b': 1000/3.5, '8a': 1000/7.5,
        '8b': 1000/9, '10a': 100},
    'Justiça Militar da União': {'2a': 1000/9.5, '2b': 1000/9.9, '2ant': 100,
                                 '4a': 1000/9.5, '4b': 1000/9.9},
    'Justiça Militar Estadual': {'2a': 1000/9, '2b': 1000/9.5, '2ant': 100,
                                 '4a': 1000/9.5, '4b': 1000/9.9},
    'Tribunal Superior Eleitoral': {'2a': 1000/7.0, '2b': 1000/9.9, '2ant': 100,
                                    '4a': 1000/9, '4b': 1000/5},
    'Tribunal Superior do Trabalho': {'2a': 1000/8.5, '2b': 1000/9.9, '2ant': 100,
                                      '4a': 1000/7, '4b': 100},
    'Superior Tribunal de Justiça': {'2ant': 100, '4a': 1000/9, '4b': 100,
                                     '6': 1000/7.5, '7a': 1000/7.5,
                                     '7b': 1000/7.5, '8': 1000/10, '10': 1000/10},
}
JE = FACTORS['Justiça Estadual']

CONFIG = {
    'meta2a': ('julgm2_a', 'distm2_a', 'suspm2_a', '2a'),
    'meta2b': ('julgm2_b', 'distm2_b', 'suspm2_b', '2b'),
    'meta2c': ('julgm2_c', 'distm2_c', 'suspm2_c', '2c'),
    'meta2ant': ('julgm2_ant', 'distm2_ant', 'suspm2_ant', '2ant'),
    'meta4a': ('julgm4_a', 'distm4_a', 'suspm4_a', '4a'),
    'meta4b': ('julgm4_b', 'distm4_b', 'suspm4_b', '4b'),
    'meta6': ('julgm6_a', 'distm6_a', 'suspm6_a', '6'),
    'meta7a': ('julgm7_a', 'distm7_a', 'suspm7_a', '7a'),
    'meta7b': ('julgm7_b', 'distm7_b', 'suspm7_b', '7b'),
    'meta8a': ('julgm8_a', 'distm8_a', 'suspm8_a', '8a'),
    'meta8b': ('julgm8_b', 'distm8_b', 'suspm8_b', '8b'),
    'meta10a': ('julgm10_a', 'distm10_a', 'suspm10_a', '10a'),
    'meta10b': ('julgm10_b', 'distm10_b', 'suspm10_b', '10b'),
}


def triplet(cols, n, lo=5, hi=400, nulls=0.1):
    out = {}
    for c in cols:
        out[c] = [None if rng.random() < nulls else rng.randint(lo, hi)
                  for _ in range(n)]
    return out


def write_csv(name, df_dict, n):
    data = {'sigla_tribunal': [name.split('.')[0].replace('teste_', '')] * n}
    data.update(df_dict)
    pd.DataFrame(data).to_csv(os.path.join(DADOS, name), index=False)


def court(sigla, ramo, n, col_groups, extra=None):
    d = {'ramo_justica': [ramo] * n}
    for cols in col_groups:
        d.update(triplet(cols, n))
    if extra:
        d.update(extra)
    write_csv(f'teste_{sigla}.csv', d, n)


M1 = ['julgados_2025', 'casos_novos_2025', 'suspensos_2025', 'dessobrestados_2025']

# full estadual court: meta1 + all 13 triplets
court('TJAA', 'Justiça Estadual', 12,
      [M1] + [list(v[:3]) for v in CONFIG.values()])
# zero meta1 denominator + one all-null meta column
court('TJBB', 'Justiça Estadual', 4, [],
      extra={
          'julgados_2025': [10, 20, 30, 40],
          'casos_novos_2025': [5, 5, 5, 5],
          'suspensos_2025': [10, 10, 5, 5],
          'dessobrestados_2025': [3, 2, 3, 2],
          'julgm2_a': [None, None, None, None],
          'distm2_a': [4, 5, 6, 7],
          'suspm2_a': [1, 1, 1, 1],
      })
# labor court: subset columns; meta2b triplet present -> JE factor fallback
court('TRT3', 'Justiça do Trabalho', 8,
      [list(CONFIG['meta2a'][:3]), list(CONFIG['meta2b'][:3]),
       list(CONFIG['meta2ant'][:3]), list(CONFIG['meta4a'][:3]), M1])
# federal court
court('TRF2', 'Justiça Federal', 10,
      [M1] + [list(CONFIG[m][:3]) for m in
              ('meta2a', 'meta2b', 'meta4a', 'meta6', 'meta7a', 'meta10a')])
# electoral -> TSE remap
court('TRE-AC', 'Justiça Eleitoral', 6,
      [M1, list(CONFIG['meta2a'][:3]), list(CONFIG['meta4b'][:3])])
# superior courts: TST remap
court('TST', 'Tribunais Superiores', 7,
      [M1, list(CONFIG['meta2a'][:3]), list(CONFIG['meta4a'][:3])])
# STJ: stj triplets + 8a/10a variants; meta10_stj has zero denominator ->
# NA -> meta10a NOT suppressed, while meta8_stj computes -> 8a/8b suppressed
court('STJ', 'Tribunais Superiores', 5,
      [list(CONFIG['meta8a'][:3]), list(CONFIG['meta10a'][:3]),
       list(CONFIG['meta6'][:3]), M1],
      extra={
          'julgm8': [100, 110, None, 90, 80],
          'dism8': [50, 60, 55, 45, 40],
          'suspm8': [10, 12, 9, 8, 7],
          'julgm10': [70, 75, 72, None, 68],
          'dism10': [20, 20, 20, 20, 20],
          'suspm10': [25, 25, 25, 15, 10],
      })
# military union + state
court('STM', 'Justiça Militar da União', 6,
      [M1, list(CONFIG['meta2a'][:3]), list(CONFIG['meta2b'][:3])])
court('TJMMG', 'Justiça Militar Estadual', 6,
      [M1, list(CONFIG['meta2a'][:3]), list(CONFIG['meta4b'][:3])])
# unknown branch -> JE fallback + warning path
court('XX99', 'Justiça Desconhecida', 5,
      [M1, list(CONFIG['meta2c'][:3])])

# header-only file (skipped: empty)
with open(os.path.join(DADOS, 'teste_vazio.csv'), 'w') as f:
    f.write('sigla_tribunal,ramo_justica,julgados_2025\n')
# missing identity columns (skipped)
with open(os.path.join(DADOS, 'teste_semchave.csv'), 'w') as f:
    f.write('julgados_2025,casos_novos_2025\n1,2\n3,4\n')
# malformed rows (extra fields -> dropped by on_bad_lines='skip' /
# DROPMALFORMED); valid rows survive
with open(os.path.join(DADOS, 'teste_TJCC.csv'), 'w') as f:
    f.write('sigla_tribunal,ramo_justica,julgados_2025,casos_novos_2025,suspensos_2025\n')
    f.write('TJCC,Justiça Estadual,10,20,5\n')
    f.write('TJCC,Justiça Estadual,12,22,6,EXTRA,EXTRA2\n')
    f.write('TJCC,Justiça Estadual,14,24,7\n')


# ---- independent golden computation (documented reference semantics) ----

def calcular_meta(df, j, d, s, fator):
    if not all(c in df.columns and df[c].notna().any() for c in (j, d, s)):
        return 'NA'
    num = df[j].sum()
    if pd.isna(num):
        return 'NA'
    den = df[d].sum() - df[s].sum()
    if den == 0 or fator == 'NA' or (isinstance(fator, float) and math.isnan(fator)):
        return 'NA'
    return round((num / den) * fator, 2)


rows = []
for fn in sorted(os.listdir(DADOS)):
    if not fn.endswith('.csv'):
        continue
    df = pd.read_csv(os.path.join(DADOS, fn), on_bad_lines='skip')
    if df.empty or 'sigla_tribunal' not in df.columns or 'ramo_justica' not in df.columns:
        continue
    sigla = df['sigla_tribunal'].iloc[0]
    ramo = df['ramo_justica'].iloc[0]
    if ramo == 'Tribunais Superiores':
        ramo_usado = {'TST': 'Tribunal Superior do Trabalho',
                      'STJ': 'Superior Tribunal de Justiça'}.get(sigla, ramo)
    elif ramo == 'Justiça Eleitoral':
        ramo_usado = 'Tribunal Superior Eleitoral'
    else:
        ramo_usado = ramo
    fat = FACTORS.get(ramo_usado, JE)

    # meta1
    meta1 = 'NA'
    base = ['julgados_2025', 'casos_novos_2025', 'suspensos_2025']
    if all(c in df.columns and df[c].notna().any() for c in base):
        sj = df['julgados_2025'].sum()
        sc = df['casos_novos_2025'].sum()
        ss = df['suspensos_2025'].sum()
        sd = 0
        if 'dessobrestados_2025' in df.columns and df['dessobrestados_2025'].notna().any():
            sd = df['dessobrestados_2025'].sum()
        if not pd.isna(sj):
            den = sc + sd - ss
            if den != 0:
                meta1 = round(sj / den * 100, 2)

    metas = {}
    for name, (j, d, s, key) in CONFIG.items():
        metas[name] = calcular_meta(df, j, d, s, fat.get(key, JE.get(key, 'NA')))
    if '8' in fat:
        metas['meta8_stj'] = calcular_meta(df, 'julgm8', 'dism8', 'suspm8', fat.get('8'))
        if metas.get('meta8_stj') != 'NA':
            metas.pop('meta8a', None)
            metas.pop('meta8b', None)
    if '10' in fat:
        metas['meta10_stj'] = calcular_meta(df, 'julgm10', 'dism10', 'suspm10', fat.get('10'))
        if metas.get('meta10_stj') != 'NA':
            metas.pop('meta10a', None)
            metas.pop('meta10b', None)

    row = {'sigla_tribunal': sigla, 'ramo_justica': ramo, 'meta1': meta1}
    row.update(metas)
    rows.append(row)

res = pd.DataFrame(rows).astype(str).replace('nan', 'NA')
principal = ['sigla_tribunal', 'ramo_justica', 'meta1']
metas_cols = sorted(c for c in res.columns
                    if c.startswith('meta') and c != 'meta1' and not c.endswith('_stj'))
stj_cols = sorted(c for c in res.columns if c.endswith('_stj'))
rest = sorted(c for c in res.columns if c not in principal + metas_cols + stj_cols)
res = res[principal + metas_cols + stj_cols + rest]
res = res.sort_values('sigla_tribunal').reset_index(drop=True)
res.to_csv(os.path.join(BASE, 'golden_resumo.csv'), index=False, sep=';')
print(res.to_string())
print("\nwrote", os.path.join(BASE, 'golden_resumo.csv'))
