"""Convert the reference's .mat point-cloud/graph assets to bundled .npz.

Data files only (no code): the same seven assets the reference ships
(``pygsp/data/pointclouds/*.mat``, loaded by ``utils.loadmat``,
``utils.py:56-81``), re-encoded so pygsp_tpu has no scipy.io dependency at
runtime. Sparse matrices are stored as ``<key>__sparse_{row,col,data,shape}``
and reassembled by ``pygsp_tpu.utils.loadmat``.
"""

import os

import numpy as np
import scipy.io
import scipy.sparse as sps

SRC = '/root/reference/pygsp/data/pointclouds'
DST = os.path.join(os.path.dirname(__file__), '..', 'pygsp_tpu', 'data',
                   'pointclouds')


def convert(name: str) -> None:
    mat = scipy.io.loadmat(os.path.join(SRC, name + '.mat'))
    out = {}
    for key, value in mat.items():
        if key.startswith('__'):
            continue
        if sps.issparse(value):
            coo = value.tocoo()
            out[f'{key}__sparse_row'] = coo.row
            out[f'{key}__sparse_col'] = coo.col
            out[f'{key}__sparse_data'] = coo.data
            out[f'{key}__sparse_shape'] = np.array(coo.shape)
        else:
            value = np.asarray(value)
            if value.dtype == object:
                # matlab cell arrays of strings → flat unicode array
                value = np.array([np.asarray(v).item() if np.asarray(v).size
                                  else '' for v in value.ravel()])
            out[key] = value
    os.makedirs(DST, exist_ok=True)
    np.savez_compressed(os.path.join(DST, name + '.npz'), **out)
    print(name, {k: getattr(v, 'shape', v) for k, v in out.items()})


if __name__ == '__main__':
    for name in ('airfoil', 'bunny', 'david500', 'david64', 'logogsp',
                 'minnesota', 'two_moons'):
        convert(name)
