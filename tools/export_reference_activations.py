"""Export reference-network activations for the parity harness.

Run this OUTSIDE this repo's environment, in the reference's TF1 container
(/root/reference/README.md:15-34), with the reference's Code/ on sys.path:

    python export_reference_activations.py \
        --checkpoint /path/to/Networks/net-300000 \
        --patch patch.npz --out reference_acts.npz

``patch.npz`` must hold ``input_x`` [N, 6] and ``adj_0/1/2`` one-indexed
K-lists — the file written by
``facet_graph_convolution_tpu.evaluation.parity.export_activations`` has
exactly these keys, so export ours first and feed the same file here.

The graph is rebuilt op-by-op with the REFERENCE's own functions
(model.custom_conv2d / custom_binary_tree_pooling / custom_upsampling /
custom_lin / lrelu) inside the same variable-scope sequence as
``get_model_reg_multi_scale`` (model.py:853-941), so variable names match
the checkpoint and every intermediate is captured. Output npz carries
``act_<layer>`` arrays named to match
``evaluation.parity.capture_activations``, ready for
``evaluation.parity.compare_activations``.

This script is the only TF-dependent artifact in the repo; everything else
(including reading the TF checkpoint itself) is TF-free — see
``evaluation.tf_checkpoint``.
"""

import argparse

import numpy as np
import tensorflow as tf

if tf.__version__.startswith("2"):
    tf = tf.compat.v1
    tf.disable_eager_execution()

from model import (  # the reference's Code/model.py
    custom_binary_tree_pooling,
    custom_conv2d,
    custom_lin,
    custom_upsampling,
    lrelu,
)

ALPHA = 0.1
STEPS = 2


def build(x, adjs):
    """get_model_reg_multi_scale's single-scale graph (model.py:853-941),
    returning every named intermediate."""
    acts = {}

    with tf.variable_scope("Level0"):
        h1_pre, _ = custom_conv2d(x, adjs[0], 32, 9)
        acts["conv1"] = h1_pre
        h1 = lrelu(h1_pre, ALPHA)
        acts["conv1_act"] = h1
        p1 = custom_binary_tree_pooling(h1, steps=STEPS)
        acts["pool1"] = p1
    with tf.variable_scope("Level1"):
        h2_pre, _ = custom_conv2d(p1, adjs[1], 64, 9)
        acts["conv2"] = h2_pre
        h2 = lrelu(h2_pre, ALPHA)
        p2 = custom_binary_tree_pooling(h2, steps=STEPS)
        acts["pool2"] = p2
    with tf.variable_scope("Level2"):
        h3_pre, _ = custom_conv2d(p2, adjs[2], 128, 9)
        acts["conv3"] = h3_pre
        h3 = lrelu(h3_pre, ALPHA)
        d3_pre, _ = custom_conv2d(h3, adjs[2], 128, 9)
        acts["dconv3"] = d3_pre
        d3 = lrelu(d3_pre, ALPHA)
        u2 = custom_upsampling(d3, steps=STEPS)
        acts["upsamp2"] = u2
    with tf.variable_scope("Level1"):
        up2, _ = custom_conv2d(u2, adjs[1], 64, 9)
        acts["upconv2"] = up2
        cat2 = tf.concat([up2, h2], axis=-1)
        d2_pre, _ = custom_conv2d(cat2, adjs[1], 64, 9)
        acts["dconv2"] = d2_pre
        d2 = lrelu(d2_pre, ALPHA)
        u1 = custom_upsampling(d2, steps=STEPS)
        acts["upsamp1"] = u1
    with tf.variable_scope("Level0"):
        up1, _ = custom_conv2d(u1, adjs[0], 32, 9)
        acts["upconv1"] = up1
        cat1 = tf.concat([up1, h1], axis=-1)
        d1_pre, _ = custom_conv2d(cat1, adjs[0], 32, 9)
        acts["dconv1"] = d1_pre
        d1 = lrelu(d1_pre, ALPHA)
        fc1 = lrelu(custom_lin(d1, 1024), ALPHA)
        acts["fc1"] = fc1
        acts["out0"] = custom_lin(fc1, 3)
    return acts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--patch", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    data = np.load(args.patch)
    x_np = data["input_x"][None].astype(np.float32)        # [1, N, 6]
    adjs_np = [data[f"adj_{i}"][None].astype(np.int32) for i in range(3)]

    x = tf.placeholder(tf.float32, shape=[1, x_np.shape[1], x_np.shape[2]])
    adjs = [tf.placeholder(tf.int32, shape=a.shape) for a in adjs_np]
    acts = build(x, adjs)

    sess = tf.Session()
    tf.train.Saver().restore(sess, args.checkpoint)
    feed = {x: x_np, **{p: a for p, a in zip(adjs, adjs_np)}}
    values = sess.run(acts, feed)

    np.savez_compressed(
        args.out,
        **{f"act_{k}": np.squeeze(v, axis=0) for k, v in values.items()},
    )
    print(f"wrote {args.out}: {sorted(values)}")


if __name__ == "__main__":
    main()
