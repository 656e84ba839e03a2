"""Independent PyTorch DLRM for differential training tests.

The reference verifies itself by diffing two independent implementations
(PyTorch vs Caffe2, ``/root/reference/test/dlrm_s_test.sh``). We use the same
strategy: this is a fresh, minimal torch implementation of the DLRM math
(EmbeddingBag sum + MLPs + dot interaction + BCE + SGD/Adagrad/RWSAdagrad
with sparse embedding grads), initialized from the SAME numpy parameters as
the JAX model under test, trained on the SAME batches — losses and post-step
parameters must match to fp32 tolerance.

Test-only code: torch never appears in the framework itself.
"""

from __future__ import annotations

import numpy as np
import torch


class TorchDLRM(torch.nn.Module):
    def __init__(self, params, sigmoid_bot=-1):
        """params: the dlrm_yx_tpu parameter pytree (numpy-convertible).
        Tables are reconstructed per-table from the flat group stores."""
        super().__init__()
        self.sigmoid_bot = sigmoid_bot
        self.bot = self._mlp(params["bot"])
        self.top = self._mlp(params["top"])
        self.tables = torch.nn.ModuleList()

    @staticmethod
    def _mlp(layers):
        mods = torch.nn.ModuleList()
        for w, b in layers:
            w = np.asarray(w)
            lin = torch.nn.Linear(w.shape[0], w.shape[1])
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(np.asarray(w).T.copy()))
                lin.bias.copy_(torch.from_numpy(np.asarray(b).copy()))
            mods.append(lin)
        return mods

    def add_tables(self, tables):
        for t in tables:
            emb = torch.nn.EmbeddingBag(
                t.shape[0], t.shape[1], mode="sum", sparse=True,
                include_last_offset=False,
            )
            with torch.no_grad():
                emb.weight.copy_(torch.from_numpy(np.asarray(t).copy()))
            self.tables.append(emb)

    def _apply_mlp(self, x, mods, sigmoid_layer):
        for i, lin in enumerate(mods):
            x = lin(x)
            if i == sigmoid_layer:
                x = torch.sigmoid(x)
            else:
                x = torch.relu(x)
        return x

    def forward(self, dense_x, indices, weights):
        """dense_x [B, m]; indices/weights [T, B, L] (padded layout)."""
        x = self._apply_mlp(dense_x, self.bot, self.sigmoid_bot)
        ly = []
        t, b, l = indices.shape
        for k, emb in enumerate(self.tables):
            flat_idx = indices[k].reshape(-1)
            offsets = torch.arange(b, dtype=torch.long) * l
            per_sample = weights[k].reshape(-1)
            ly.append(emb(flat_idx, offsets, per_sample_weights=per_sample))
        d = x.shape[1]
        slots = []
        for y in ly:
            k = y.shape[1] // d
            slots.extend(torch.split(y, d, dim=1)) if k > 1 else slots.append(y)
        tcat = torch.cat([x.unsqueeze(1)] + [s.unsqueeze(1) for s in slots], dim=1)
        z = torch.bmm(tcat, tcat.transpose(1, 2))
        f = tcat.shape[1]
        li, lj = torch.tril_indices(f, f, offset=-1)
        r = torch.cat([x, z[:, li, lj]], dim=1)
        # top MLP with sigmoid at last layer
        for i, lin in enumerate(self.top):
            r = lin(r)
            r = torch.sigmoid(r) if i == len(self.top) - 1 else torch.relu(r)
        return r


def train_steps(model, batches, lr, optimizer="sgd", eps=1e-10):
    """Run len(batches) BCE+optimizer steps; return losses."""
    dense_params = [p for m in (model.bot, model.top) for lin in m for p in lin.parameters()]
    sparse_params = [emb.weight for emb in model.tables]
    if optimizer == "sgd":
        opt = torch.optim.SGD(dense_params + sparse_params, lr=lr)
        opts = [opt]
    elif optimizer == "adagrad":
        opts = [
            torch.optim.Adagrad(dense_params, lr=lr, eps=eps),
            torch.optim.Adagrad(sparse_params, lr=lr, eps=eps),
        ]
    else:
        raise ValueError(optimizer)
    loss_fn = torch.nn.BCELoss()
    losses = []
    for batch in batches:
        dense = torch.from_numpy(batch.dense)
        idx = torch.from_numpy(batch.indices.astype(np.int64))
        w = torch.from_numpy(batch.weights)
        y = torch.from_numpy(batch.labels)
        p = model(dense, idx, w)
        loss = loss_fn(p, y)
        for o in opts:
            o.zero_grad()
        loss.backward()
        for o in opts:
            o.step()
        losses.append(float(loss))
    return losses
