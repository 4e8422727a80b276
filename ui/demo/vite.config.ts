import { defineConfig } from 'vite';
import react from '@vitejs/plugin-react';
import { fileURLToPath } from 'node:url';
import { dirname, resolve } from 'node:path';

const here = dirname(fileURLToPath(import.meta.url));

export default defineConfig({
  plugins: [react()],
  // Serve the committed proof fixtures as static assets.
  publicDir: resolve(here, '../test/fixtures'),
  resolve: {
    alias: { '@luminair-tpu/web': resolve(here, '../src/index.ts') },
  },
});
